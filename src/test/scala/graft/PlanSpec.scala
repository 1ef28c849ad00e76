package graft

import graft.dsq.SparkSpec

/** Physical-plan assertions: the properties that make these queries
  * survive a 100× scale-up are checked in CI, not just eyeballed —
  * filter pushdown to the parquet scan, broadcast joins for dimension
  * tables, top-k as TakeOrderedAndProject (no global sort), and
  * whole-stage codegen coverage. Plans are taken AFTER execution so AQE
  * re-planning is included (what actually ran, not the static guess).
  */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def executed(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    // collect() drives THIS df's QueryExecution, so AQE finalizes the
    // plan we assert on (a separate writer would leave it un-executed);
    // results at sf0.001 are tiny
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter is pushed into the parquet scan") {
    val p = executed("q02_filter_agg")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters: [")).toSeq
    assert(pushed.nonEmpty, s"no PushedFilters in plan:\n$p")
    assert(pushed.exists(!_.contains("PushedFilters: []")),
      s"empty pushdown — scan reads everything:\n${pushed.mkString("\n")}")
  }

  test("q02: scan is pruned to referenced columns only") {
    val p = executed("q02_filter_agg")
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty)
    // q02 aggregates two measures under two predicates — a scan carrying
    // all 16 lineitem columns would mean pruning is broken
    assert(!scans.exists(_.contains("l_comment")),
      s"unpruned scan:\n${scans.mkString("\n")}")
  }

  test("q03: dimension sides broadcast (no shuffle of the fact table for the join)") {
    val p = executed("q03_join_topk")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("q05: ORDER BY + LIMIT runs as TakeOrderedAndProject, not a global sort") {
    val p = executed("q05_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not fused:\n$p")
  }

  test("q01: aggregation stays inside whole-stage codegen") {
    val p = executed("q01_agg")
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      s"no codegen span:\n$p")
  }

  test("p04: Jaccard verification joins broadcast the signature table") {
    val p = executed("p04_dedup_ngram")
    assert(p.contains("BroadcastHashJoin"), s"verify joins shuffled:\n$p")
    assert(p.contains("sortedlongjaccard"),
      s"native Jaccard expression missing from plan:\n$p")
  }
}
