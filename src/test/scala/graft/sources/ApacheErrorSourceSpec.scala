package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.dsq.SparkSpec

/** The DSv2 apache-error source: grammar, optional-section and
  * non-matching-line "" conventions, splits, pushdown, and agreement
  * with the CLI reader.
  */
class ApacheErrorSourceSpec extends SparkSpec {

  private val full =
    "[Fri Sep 09 10:42:29.902022 2011] [core:error] " +
      "[pid 35708:tid 4328636416] [client 72.15.99.187] " +
      "File does not exist: /usr/local/apache2/htdocs/favicon.ico"
  private val noPid =
    "[Fri Sep 09 10:42:31.000000 2011] [mpm_event:notice] " +
      "AH00489: Apache/2.4.52 configured"

  private def write(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory(s"graft_ae_$name")
    Files.writeString(dir.resolve("error.log"),
      lines.mkString("", "\n", "\n"))
    dir.toString
  }

  test("parse: optional pid/client sections empty, non-matching line all-empty") {
    val dir = write("parse", Seq(full, noPid, "totally not an error line"))
    val df = spark.read.format("graft-apacheerror").load(dir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("time", "level", "pid", "client", "message"))
    assert(df.schema.fields.forall(_.dataType == StringType))
    val rows = df.orderBy("time").collect()
    // the regexp_extract convention: a non-matching line is an all-""
    // row, NOT a dropped one (CLI byte-parity)
    assert(rows.length == 3, rows.toSeq)
    val byLevel = rows.map(r => r.getAs[String]("level") -> r).toMap
    val e = byLevel("core:error")
    assert(e.getAs[String]("pid") == "35708:tid 4328636416")
    assert(e.getAs[String]("client") == "72.15.99.187")
    assert(e.getAs[String]("message").startsWith("File does not exist"))
    val n = byLevel("mpm_event:notice")
    assert(n.getAs[String]("pid") == "" && n.getAs[String]("client") == "")
    assert(n.getAs[String]("message").startsWith("AH00489"))
    val bad = byLevel("")
    assert(bad.toSeq.forall(_ == ""), bad.toSeq)
  }

  test("CLI reader agreement") {
    val dir = write("cli", Seq(full, noPid))
    val v2 = spark.read.format("graft-apacheerror").load(dir)
      .collect().map(_.toString).sorted.toSeq
    val cli = graft.dsq.Readers.apacheError(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(v2 == cli)
  }

  test("user schema with an unknown column fails instead of binding group(0)") {
    val dir = write("badschema", Seq(full))
    val e = intercept[Exception] {
      spark.read.format("graft-apacheerror")
        .schema(StructType(Seq(StructField("not_a_field", StringType))))
        .load(dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unknown column(s) not_a_field")), s"$e")
    // re-ordered legal subset still works
    val ok = spark.read.format("graft-apacheerror")
      .schema(StructType(Seq(
        StructField("message", StringType), StructField("level", StringType))))
      .load(dir).head()
    assert(ok.getString(1) == "core:error")
  }

  test("splits + pushdown: chunked read equals whole, filter in scan") {
    val lines = (0 until 4000).map { i =>
      val lvl = if (i % 5 == 0) "core:error" else "mpm_event:notice"
      s"[Fri Sep 09 10:42:$i 2011] [$lvl] [pid $i] [client 10.0.0.$i] msg $i"
    }
    val dir = write("split", lines)
    val whole = spark.read.format("graft-apacheerror").load(dir)
    val split = spark.read.format("graft-apacheerror")
      .option("maxSplitBytes", "8192").load(dir)
    assert(split.rdd.getNumPartitions > 5)
    assert(split.collect().map(_.toString).sorted.toSeq ==
      whole.collect().map(_.toString).sorted.toSeq)
    val errs = split.filter(col("level") === "core:error")
    val plan = errs.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), s"filter not fully pushed:\n$plan")
    assert(plan.contains("EqualTo(level,core:error)"),
      s"filter missing from scan:\n$plan")
    assert(errs.count() == 800)
  }
}
