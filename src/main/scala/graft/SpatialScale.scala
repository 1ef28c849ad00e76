package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Constant-density spatial scaling harness (VERDICT r9 task 4). The
  * p147/p150 gates derive their point clouds from event_id modulo a
  * FIXED plane (100×100), so a ScaleGen ×f corpus drops f× the points
  * onto the same plane — ε-edges grow ×f², and a 10× GateTimer row
  * measures density amplification, not operator scaling. This harness
  * is the constant-λ mode: the plane side scales with √f, so area ∝ n
  * and the expected ε-neighborhood size stays constant while the point
  * count grows — the regime a 100 TB geo/embedding corpus actually
  * lives in. SCALE_VALIDATION.md carries BOTH rows: the densified
  * GateTimer one as the adversarial case, this one as the
  * operator-scaling case.
  *
  * Usage: runMain graft.SpatialScale <dir> <factor> [runs]
  * `factor` is the corpus scale of `dir` relative to sf0.1 (1 for
  * /root/testdata/sf0.1, 10 for the ScaleGen 10× output, …); the
  * modulus of both hash planes is multiplied by √factor.
  */
object SpatialScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val factor = args(1).toDouble
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val side = math.sqrt(factor)
    val m147 = math.max(1L, math.round(1000 * side))
    val m150 = math.max(1L, math.round(100000 * side))
    val ev = Tables.load(spark, dir, "events")

    def time(f: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      var best = Double.MaxValue
      var rows = -1L
      for (_ <- 0 until runs) {
        val t0 = System.nanoTime()
        val df = f()
        df.write.format("noop").mode("overwrite").save()
        best = best.min((System.nanoTime() - t0) / 1e9)
        if (rows < 0) rows = df.count()
      }
      (best, rows)
    }

    // The gates' modular-arithmetic point constructions can't be
    // density-controlled: any polynomial of stride-s ids collapses to
    // m/gcd(s·…, m) residue classes, so depending on (stride, modulus)
    // the cloud is either co-location-dominated or finely spread — the
    // regime would CHANGE across factors. md5-derived coordinates are
    // residue-free: uniform over the plane at every factor, so area ∝ n
    // really does hold λ constant and the rows compare like for like.
    def hashCoord(tag: String, m: Long): org.apache.spark.sql.Column =
      (conv(substring(md5(concat(lit(tag), col("id").cast("string"))),
        1, 7), 16, 10).cast("long") % m).cast("double")
    val (t147, n147) = time(() => operators.Pipeline.gridNeighborPairs(
      ev.filter(col("event_id") % 20 === 0)
        .select(col("event_id").as("id"))
        .select(col("id"), (hashCoord("sx:", m147) / 10).as("x"),
          (hashCoord("sy:", m147) / 10).as("y")),
      r = 2.0))
    val (t150, n150) = time(() => pipeline.Clustering.dbscanGrid(
      ev.filter(col("event_id") % 5 === 0)
        .select(col("event_id").as("id"))
        .select(col("id"), (hashCoord("dx:", m150) / 1000).as("x"),
          (hashCoord("dy:", m150) / 1000).as("y")),
      eps = 2.0, minPts = 4))
    // scala.math functions only — no Date.now-style nondeterminism
    println(f"""{"dir":"$dir","factor":$factor%.0f,""" +
      f""""p147_constant_density":{"sec":$t147%.2f,"rows":$n147},""" +
      f""""p150_constant_density":{"sec":$t150%.2f,"rows":$n150}}""")
    spark.stop()
  }
}
