package graft.pipeline

import graft.dsq.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-violation tests for the release guards: every constraint
  * must count exactly the rows planted to break it, and the k-anonymity
  * report must suppress exactly the small groups.
  */
class ContractsSpec extends SparkSpec {
  import spark.implicits._

  private def contract() = {
    // 6 orders: duplicate key 1 (x2 -> 1 pk violation), one bad status,
    // one non-positive price, one orphan custkey, one NULL status (NOT
    // a domain violation under SQL NULL semantics)
    val orders = Seq(
      (1L, 10L, "O", 100.0), (1L, 10L, "F", 200.0),
      (2L, 11L, "X", 300.0), (3L, 12L, "P", 0.0),
      (4L, 99L, "O", 400.0), (5L, 10L, null.asInstanceOf[String], 500.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    // customers 10..12 exist; one NULL acctbal
    val customer = Seq((10L, Some(1.0)), (11L, Some(2.0)),
      (12L, None: Option[Double]))
      .toDF("c_custkey", "c_acctbal")
    // 4 lineitems: one orphan orderkey, one quantity out of range
    val lineitem = Seq((1L, 5.0), (2L, 51.0), (3L, 1.0), (7L, 9.0))
      .toDF("l_orderkey", "l_quantity")
    Contracts.dataContract(orders, customer, lineitem)
  }

  test("dataContract: planted violations counted exactly, NULLs per SQL") {
    val rows = contract().collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(rows("orders_pk_unique") == ((6L, 1L, false)))
    assert(rows("orders_status_domain") == ((6L, 1L, false)),
      "NULL status must not count as a domain violation")
    assert(rows("orders_price_positive") == ((6L, 1L, false)))
    assert(rows("orders_fk_customer") == ((6L, 1L, false)))
    assert(rows("lineitem_fk_orders") == ((4L, 1L, false)))
    assert(rows("lineitem_qty_range") == ((4L, 1L, false)))
    assert(rows("customer_acctbal_notnull") == ((3L, 1L, false)))
    assert(rows.size == 7)
  }

  test("dataContract: clean tables pass every check") {
    val orders = Seq((1L, 10L, "O", 1.0), (2L, 10L, "F", 2.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val customer = Seq((10L, Some(0.0))).toDF("c_custkey", "c_acctbal")
    val lineitem = Seq((1L, 50.0), (2L, 1.0)).toDF("l_orderkey", "l_quantity")
    val out = Contracts.dataContract(orders, customer, lineitem).collect()
    assert(out.length == 7 && out.forall(_.getBoolean(3)))
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("dataContract: referential checks plan equi anti-joins, no products") {
    val df = contract()
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") ||
      // the 1-row (checked x violations) barrier is the only allowed
      // product; a fact-sized product would also plan BNLJ on the keys
      !p.contains("BroadcastNestedLoopJoin LeftAnti"),
      s"referential check fell back to a product join:\n$p")
  }

  test("kAnonymity: small groups suppressed, l-diversity counted") {
    // group (1,a): 3 rows, 2 distinct buckets; (1,b): 1 row;
    // (2,a): 2 rows, 1 bucket
    val df = Seq(
      (1L, "a", 0L), (1L, "a", 1L), (1L, "a", 0L),
      (1L, "b", 5L),
      (2L, "a", 2L), (2L, "a", 2L))
      .toDF("qk1", "qk2", "sens")
    val out = Contracts.kAnonymity(df, Seq("qk1", "qk2"), col("sens"), k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, "a", 3L, true, 2L),
      (1L, "b", 1L, false, 1L),
      (2L, "a", 2L, true, 1L)))
  }

  test("fdProfile: holding and violated FDs, composite keys, null " +
      "determinants excluded, null dependents distinct") {
    // k -> v: key 1 maps to {x, x} (holds so far), key 2 to {x, y}
    // (violates), key 3 to {x, NULL} (violates — NULL is one value
    // distinct from x), key 4 to {NULL, NULL} (one value → holds);
    // null key row excluded entirely; (k, k2) -> v: every composite
    // key maps to one v → holds
    val df = Seq(
      (Some(1L), "a", Some("x")), (Some(1L), "b", Some("x")),
      (Some(2L), "a", Some("x")), (Some(2L), "b", Some("y")),
      (Some(3L), "a", Some("x")), (Some(3L), "b", None),
      (Some(4L), "a", None), (Some(4L), "b", None),
      (None: Option[Long], "a", Some("z")))
      .toDF("k", "k2", "v")
    val out = Contracts.fdProfile(df, Seq(
        (Seq("k"), "v"), (Seq("k", "k2"), "v")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(out == Seq(
      ("k", "v", 4L, 2L, false),
      ("k,k2", "v", 8L, 0L, true)), out.toString)
  }

  test("deletionAudit: row accounting exact, absent deletion keys " +
      "don't inflate, residual re-measured on the output") {
    // rows for users 1,1,2,3; deletion set {1, 99} (99 absent) →
    // 2 rows deleted, 1 key matched, clean
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
      .toDF("user_id", "payload")
    val keys = Seq(1L, 99L).toDF("user_id")
    val got = Contracts.deletionAudit(df, "user_id", keys).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == Seq((4L, 2L, 2L, 1L, 0L, true)), got.toString)
  }
}
