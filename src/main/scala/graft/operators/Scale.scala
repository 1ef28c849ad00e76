package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Scale-pattern demonstrations under the oracle gate: each runs a
  * physical-design technique (bucketing, salting) whose *result* is
  * checkable against a plain-SQL oracle while the *plan* exercises the
  * 100 TB pattern.
  */
object Scale {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[QueryDef] = Seq(

    // Bucketed co-located join: both sides written bucketed by the join
    // key with the same bucket count → the join reads bucket-aligned
    // files with NO shuffle exchange. This is the pre-partitioning story
    // for repeated fact-fact joins at scale.
    QueryDef("x01_bucketed_join",
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // drop catalog entries AND leftover warehouse dirs (the in-memory
      // catalog forgets tables across JVMs; the directory persists and
      // saveAsTable then fails with LOCATION_ALREADY_EXISTS)
      Seq("x01_orders_b", "x01_lineitem_b").foreach { tb =>
        s.sql(s"DROP TABLE IF EXISTS $tb")
        val wh = java.net.URI.create(
          s.conf.get("spark.sql.warehouse.dir")).getPath
        val dirF = new java.io.File(wh, tb)
        if (dirF.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(dirF)
        }
      }
      try {
        t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .mode("overwrite").saveAsTable("x01_orders_b")
        t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .mode("overwrite").saveAsTable("x01_lineitem_b")
        val joined = s.table("x01_orders_b")
          .join(s.table("x01_lineitem_b"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("qty"))
        // materialize NOW, while the no-broadcast confs hold, so the
        // plan that runs is the bucket-aligned shuffle-free SMJ (a
        // caller-triggered action later would re-plan under restored
        // confs); then hand back the materialized result
        val out = java.nio.file.Paths.get(
          sys.props.getOrElse("java.io.tmpdir", "/tmp"),
          "graft_fmt", "x01_result").toString
        joined.write.mode("overwrite").parquet(out)
        s.read.parquet(out)
      } finally {
        s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        s.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    },

    // Salted skew join: l_returnflag has 3 values (extreme skew for a
    // shuffle join). Salting the fact side N ways and exploding the dim
    // side N ways spreads each hot key over N shuffle partitions.
    QueryDef("x02_salted_skew_join",
      """SELECT flag_label, COUNT(*) AS n FROM lineitem
        |JOIN (VALUES ('A', 'returned-a'), ('N', 'kept'), ('R', 'returned-r'))
        |  AS d(flag, flag_label) ON l_returnflag = flag
        |GROUP BY flag_label""".stripMargin) { (s, dir) =>
      import s.implicits._
      val salt = 16
      val dim = Seq(("A", "returned-a"), ("N", "kept"), ("R", "returned-r"))
        .toDF("flag", "flag_label")
      val saltedFact = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"))
        .withColumn("salt", pmod(hash(col("l_orderkey")), lit(salt)))
      val explodedDim = dim
        .withColumn("salt", explode(sequence(lit(0), lit(salt - 1))))
        .hint("shuffle_hash")
      saltedFact
        .join(explodedDim,
          col("l_returnflag") === col("flag") && saltedFact("salt") === explodedDim("salt"))
        .groupBy("flag_label")
        .agg(count(lit(1)).as("n"))
    }
  )
}
