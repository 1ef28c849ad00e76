package graft.dsq

import org.apache.spark.sql.types._

/** The reference's "Shape" schema language (reference: README.md:445-490,
  * main.go:103-117; kinds scalar|array|object|varied|unknown), rendered
  * from a Spark schema of the *raw* (pre-flatten) parse.
  */
sealed trait Shape
object Shape {
  final case class Scalar(name: String) extends Shape
  final case class Arr(of: Shape) extends Shape
  final case class Obj(fields: Seq[(String, Shape)]) extends Shape
  case object Unknown extends Shape

  def ofDataType(dt: DataType): Shape = dt match {
    case st: StructType =>
      Obj(st.fields.toSeq.map(f => f.name -> ofDataType(f.dataType)))
    case at: ArrayType => Arr(ofDataType(at.elementType))
    case _: MapType => Obj(Nil)
    case StringType => Scalar("string")
    case BooleanType => Scalar("boolean")
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | _: DecimalType => Scalar("number")
    case TimestampType | DateType => Scalar("string")
    case NullType => Scalar("null")
    case _ => Unknown
  }

  /** A file table is always an array of row objects. */
  def ofTable(schema: StructType): Shape = Arr(ofDataType(schema))

  private def esc(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** JSON rendering (reference test scripts/test.py:242-266). */
  def toJson(s: Shape, indent: Int = 0): String = {
    val pad = "  " * indent
    val pad1 = "  " * (indent + 1)
    s match {
      case Scalar(n) =>
        s"{\n${pad1}\"kind\": \"scalar\",\n${pad1}\"scalar\": ${esc(n)}\n$pad}"
      case Arr(of) =>
        s"{\n${pad1}\"kind\": \"array\",\n${pad1}\"array\": ${toJson(of, indent + 1)}\n$pad}"
      case Obj(fields) =>
        val inner = fields.map { case (k, v) =>
          s"${pad1}  ${esc(k)}: ${toJson(v, indent + 2)}"
        }.mkString(",\n")
        val body = if (fields.isEmpty) "{}" else s"{\n$inner\n$pad1}"
        s"{\n${pad1}\"kind\": \"object\",\n${pad1}\"object\": $body\n$pad}"
      case Unknown =>
        s"{\n${pad1}\"kind\": \"unknown\"\n$pad}"
    }
  }

  /** Pretty rendering (reference test scripts/test.py:228-239). */
  def toPretty(s: Shape, indent: Int = 0): String = {
    val pad = "  " * indent
    s match {
      case Scalar(n) => s"$pad$n\n"
      case Arr(of) => s"${pad}Array of\n" + toPretty(of, indent + 1)
      case Obj(fields) =>
        s"${pad}Object of\n" + fields.map { case (k, v) =>
          s"$pad  $k of\n" + toPretty(v, indent + 2)
        }.mkString
      case Unknown => s"${pad}Unknown\n"
    }
  }
}
