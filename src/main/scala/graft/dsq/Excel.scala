package graft.dsq

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.mutable
import scala.xml.XML

/** Minimal XLSX/ODS readers — ZIP + XML by hand (no POI in this distro;
  * reference uses excelize / go-openoffice, §2.1 S10–S11). Spreadsheets
  * are inherently driver-sized; rows parse on the driver then parallelize.
  * First row = header; all values surfaced as strings (numeric cells
  * render without trailing ".0"), matching the reference's
  * strings-by-default sheet model.
  */
object Excel {

  /** OLE2/CFB magic (D0 CF 11 E0 A1 B1 1A E1): legacy binary `.xls`
    * (BIFF) is an OLE2 compound file, not a ZIP. The reference advertises
    * `xls` (README.md:605) but delegates to excelize, which itself only
    * parses OOXML — so a precise unsupported-format error is the honest
    * behavior for both engines, and far better than a ZIP stack trace.
    */
  private val Ole2Magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)

  private def sniffOle2(path: String): Boolean = {
    val in = new java.io.FileInputStream(path)
    try {
      val head = in.readNBytes(8)
      head.length == 8 && java.util.Arrays.equals(head, Ole2Magic)
    } catch { case _: java.io.IOException => false }
    finally in.close()
  }

  private def zipEntry(path: String, name: String): Option[Array[Byte]] = {
    val zf =
      try new java.util.zip.ZipFile(path)
      catch { case _: java.io.IOException =>
        if (sniffOle2(path))
          throw DsqError(
            s"Legacy binary .xls (OLE2/BIFF) is not supported: $path. " +
              "Save the workbook as .xlsx and retry.")
        throw DsqError(s"Invalid spreadsheet file (not a ZIP): $path.")
      }
    try {
      Option(zf.getEntry(name)).map { e =>
        val in = zf.getInputStream(e)
        try in.readAllBytes() finally in.close()
      }
    } finally zf.close()
  }

  private def toDf(spark: SparkSession, header: Seq[String],
      rows: Seq[Seq[String]]): DataFrame = {
    val schema = StructType(header.map(h => StructField(h, StringType)))
    val data = rows.map(r =>
      Row.fromSeq(header.indices.map(i => if (i < r.length) r(i) else "")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toList), schema)
  }

  private def fmtNum(s: String): String =
    if (s.matches("-?\\d+\\.0+")) s.substring(0, s.indexOf('.')) else s

  /** Sheet names in workbook order. */
  def xlsxSheetNames(path: String): Seq[String] = {
    val wb = XML.loadString(new String(
      zipEntry(path, "xl/workbook.xml").getOrElse(
        throw DsqError(s"Invalid xlsx file: $path.")), "UTF-8"))
    (wb \\ "sheet").map(s => (s \ "@name").text)
  }

  def readXlsx(spark: SparkSession, path: String,
      sheet: Option[String]): DataFrame = {
    val names = xlsxSheetNames(path)
    val idx = sheet match {
      case None => 0
      case Some(s) =>
        val i = names.indexOf(s)
        if (i < 0) throw DsqError(s"Unknown sheet: $s.")
        i
    }
    val shared: IndexedSeq[String] =
      zipEntry(path, "xl/sharedStrings.xml").map { bytes =>
        val ss = XML.loadString(new String(bytes, "UTF-8"))
        (ss \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
      }.getOrElse(IndexedSeq.empty)
    // resolve the sheet target through the workbook rels (sheetN.xml file
    // names need not follow workbook order)
    val wb = XML.loadString(new String(
      zipEntry(path, "xl/workbook.xml").get, "UTF-8"))
    val rid = (wb \\ "sheet")(idx).attributes.asAttrMap
      .find(_._1.endsWith(":id")).map(_._2).getOrElse("")
    val relTarget = zipEntry(path, "xl/_rels/workbook.xml.rels").flatMap { b =>
      val rels = XML.loadString(new String(b, "UTF-8"))
      (rels \\ "Relationship")
        .find(r => (r \ "@Id").text == rid)
        .map(r => (r \ "@Target").text)
    }.getOrElse(s"worksheets/sheet${idx + 1}.xml")
    val sheetPath =
      if (relTarget.startsWith("/")) relTarget.stripPrefix("/")
      else s"xl/$relTarget"
    val sheetXml = zipEntry(path, sheetPath)
      .getOrElse(throw DsqError(s"Invalid xlsx file: $path."))
    val ws = XML.loadString(new String(sheetXml, "UTF-8"))
    val rows = (ws \\ "row").map { r =>
      val cells = mutable.ArrayBuffer[String]()
      (r \ "c").foreach { c =>
        // cell ref like "C4" → column index
        val ref = (c \ "@r").text.takeWhile(_.isLetter)
        val colIdx =
          if (ref.isEmpty) cells.length
          else ref.foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1
        while (cells.length < colIdx) cells += ""
        val t = (c \ "@t").text
        val v = (c \ "v").text
        val text = t match {
          case "s" => shared(v.toInt)
          case "b" => if (v == "1") "true" else "false"
          case "inlineStr" => (c \\ "t").map(_.text).mkString
          case _ => fmtNum(v)
        }
        cells += text
      }
      cells.toSeq
    }.filter(_.exists(_.nonEmpty)) // style-only padding rows don't count
    if (rows.isEmpty) throw DsqError(s"Input is empty: $path.")
    toDf(spark, rows.head, rows.tail)
  }

  def readOds(spark: SparkSession, path: String,
      sheet: Option[String]): DataFrame = {
    val content = XML.loadString(new String(
      zipEntry(path, "content.xml").getOrElse(
        throw DsqError(s"Invalid ods file: $path.")), "UTF-8"))
    val tables = (content \\ "table").filter(_.prefix == "table")
    val table = sheet match {
      case None => tables.headOption.getOrElse(
        throw DsqError(s"Input is empty: $path."))
      case Some(s) => tables.find(
        _.attributes.asAttrMap.getOrElse("table:name", "") == s)
        .getOrElse(throw DsqError(s"Unknown sheet: $s."))
    }
    val rows = (table \ "table-row").map { r =>
      val cells = mutable.ArrayBuffer[String]()
      (r \ "table-cell").foreach { c =>
        val attrs = c.attributes.asAttrMap
        val repeat = attrs.get("table:number-columns-repeated")
          .map(_.toInt).getOrElse(1)
        val vType = attrs.getOrElse("office:value-type", "")
        val text = vType match {
          case "string" | "" => (c \ "p").map(_.text).mkString
          case "boolean" => attrs.getOrElse("office:boolean-value", "")
          case _ => fmtNum(attrs.getOrElse("office:value",
            (c \ "p").map(_.text).mkString))
        }
        // honor interior repeats (consecutive blank cells shift later
        // columns otherwise); cap only the absurd 2^14-column padding,
        // which the trailing-empty trim below removes anyway
        val n = math.min(repeat, 1024)
        (0 until n).foreach(_ => cells += text)
      }
      while (cells.nonEmpty && cells.last.isEmpty) cells.remove(cells.length - 1)
      cells.toSeq
    }.filter(_.nonEmpty)
    if (rows.isEmpty) throw DsqError(s"Input is empty: $path.")
    toDf(spark, rows.head, rows.tail)
  }
}
