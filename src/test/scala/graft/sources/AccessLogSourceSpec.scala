package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType}

import graft.dsq.SparkSpec

/** The DSv2 access-log source: CLF/combined grammars, the '-' null
  * convention, rejected lines, splits, pushdown, and agreement with the
  * CLI reader.
  */
class AccessLogSourceSpec extends SparkSpec {

  private def write(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory(s"graft_al_$name")
    Files.writeString(dir.resolve("access.log"),
      lines.mkString("", "\n", "\n"))
    dir.toString
  }

  test("CLF parse: typed status/bytes, '-' means null, bad line dropped") {
    val dir = write("clf", Seq(
      """1.2.3.4 - alice [01/Jan/2024:10:00:00 +0000] "GET / HTTP/1.1" 200 1234""",
      """5.6.7.8 - - [01/Jan/2024:10:00:01 +0000] "HEAD /x HTTP/1.1" 304 -""",
      "totally not an access log line"))
    val df = spark.read.format("graft-accesslog").load(dir)
    assert(df.schema("status").dataType == LongType)
    assert(df.schema("body_bytes").dataType == LongType)
    assert(df.schema("remote_addr").dataType == StringType)
    val rows = df.orderBy("remote_addr").collect()
    assert(rows.length == 2, s"bad line not rejected: ${rows.toSeq}")
    assert(rows(0).getAs[String]("remote_user") == "alice")
    assert(rows(0).getAs[Long]("status") == 200L &&
      rows(0).getAs[Long]("body_bytes") == 1234L)
    assert(rows(1).getAs[Long]("status") == 304L &&
      rows(1).isNullAt(rows(1).fieldIndex("body_bytes")))
  }

  test("combined adds referer/user_agent; CLI reader agreement") {
    val lines = Seq(
      """9.9.9.9 - bob [02/Feb/2024:11:00:00 +0000] "POST /api HTTP/1.1" 201 77 "https://ref.example" "curl/8.0"""",
      """8.8.8.8 - - [02/Feb/2024:11:00:05 +0000] "GET /a b HTTP/1.1" 404 - "-" "Mozilla/5.0 (X11)"""")
    val dir = write("combined", lines)
    val v2 = spark.read.format("graft-accesslog")
      .option("combined", "true").load(dir)
    assert(v2.schema.fieldNames.toSeq ==
      Seq("remote_addr", "remote_ident", "remote_user", "time",
        "request", "status", "body_bytes", "referer", "user_agent"))
    val r = v2.filter(col("remote_addr") === "9.9.9.9").head()
    assert(r.getAs[String]("referer") == "https://ref.example")
    assert(r.getAs[String]("user_agent") == "curl/8.0")
    // CLI path parses the same fields (all-string there) — compare
    val cli = graft.dsq.Readers.accessLog(spark, dir, combined = true)
      .selectExpr("remote_addr", "request",
        "CAST(status AS BIGINT) AS status", "user_agent")
      .collect().map(_.toString).sorted.toSeq
    val mine = v2.selectExpr("remote_addr", "request", "status",
      "user_agent").collect().map(_.toString).sorted.toSeq
    assert(mine == cli)
  }

  test("user schema with a non-CLF column name fails instead of binding group(0)") {
    val dir = write("badschema", Seq(
      """1.1.1.1 - - [02/Feb/2024:11:00:00 +0000] "GET / HTTP/1.1" 200 5"""))
    import org.apache.spark.sql.types._
    val e = intercept[Exception] {
      spark.read.format("graft-accesslog")
        .schema(StructType(Seq(StructField("not_a_clf_field", StringType))))
        .load(dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unknown column(s) not_a_clf_field")),
      s"silent whole-line bind not prevented: $e")
    // re-ordered / re-typed legal names still work (the CLI path's
    // all-string schema depends on this)
    val ok = spark.read.format("graft-accesslog")
      .schema(StructType(Seq(
        StructField("status", StringType), StructField("remote_addr", StringType))))
      .load(dir).head()
    assert(ok.getString(0) == "200" && ok.getString(1) == "1.1.1.1")
  }

  test("splits + pushdown: chunked read equals whole, filter in scan") {
    val lines = (0 until 4000).map(i =>
      s"""10.0.${i % 256}.1 - u$i [01/Jan/2024:00:00:00 +0000] "GET /p/$i HTTP/1.1" ${if (i % 5 == 0) 500 else 200} $i""")
    val dir = write("split", lines)
    val whole = spark.read.format("graft-accesslog").load(dir)
    val split = spark.read.format("graft-accesslog")
      .option("maxSplitBytes", "8192").load(dir)
    assert(split.rdd.getNumPartitions > 5)
    assert(split.collect().map(_.toString).sorted.toSeq ==
      whole.collect().map(_.toString).sorted.toSeq)
    val errs = split.filter(col("status") === 500)
    val plan = errs.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), s"filter not fully pushed:\n$plan")
    assert(errs.count() == 800)
  }
}
