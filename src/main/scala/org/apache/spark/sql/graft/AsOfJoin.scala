package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset,
  SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** As-of join as a first-class operator — the (c) rung of the
  * customization ladder: a custom LogicalPlan + SparkStrategy +
  * SparkPlan, for semantics the built-in operators can only emulate.
  *
  * Semantics: for every left row, attach the LATEST right row of the
  * same key with `rightTs <= leftTs` (LEFT OUTER: unmatched left rows
  * keep nulls on the right) — DuckDB/kdb ASOF LEFT JOIN, the x03 gate's
  * oracle. The x03 composition (union + running `last() OVER`) already
  * achieves one shuffle per side, but it materializes tag/struct
  * padding columns through the sort and carries the window machinery;
  * this operator IS the textbook implementation — co-partition by key,
  * sort by (key, ts), one streaming merge pass per partition with O(1)
  * state (the lookahead right row + the current best match), zero extra
  * columns, no window, no union.
  *
  * Scale shape: requiredChildDistribution/Ordering declare the contract
  * and EnsureRequirements plans the minimal Exchange+Sort per side —
  * exactly the shuffles a SortMergeJoin would get, after which the
  * merge is a single forward pass. 100 TB behavior == SMJ behavior
  * (spillable sorts, no state growth), because the physical layout IS
  * an SMJ layout with a cheaper probe.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    outer: Boolean = true,
    broadcast: Boolean = false) extends BinaryNode {

  // inner mode preserves the right side's nullability: every emitted
  // row carries a real match
  override def output: Seq[Attribute] =
    if (outer) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; registered per-session via
  * `spark.experimental.extraStrategies` (idempotent — see
  * [[AsOfJoinOps.register]]) or an extensions hook.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, outer, broadcast) =>
      (if (broadcast)
        AsOfJoinBroadcastExec(planLater(l), planLater(r), lk, rk, lts,
          rts, outer)
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts,
          outer)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    outer: Boolean = true) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (outer) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // the SMJ contract: co-partition on the key, sort by (key, ts)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val nRight = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // emit UnsafeRows (collect()-safe without a projection above)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val raw = new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(nRight)
        // lookahead right row (copied — upstream sorters reuse row
        // memory) and its evaluated (key, ts)
        private var rHead: InternalRow = null
        private var rHeadKey: Any = null
        private var rHeadTs: Any = null
        // best match so far for the key currently being merged
        private var matchRow: InternalRow = null
        private var matchKey: Any = null
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next().copy()
            rHeadKey = rKeyB.eval(rHead)
            rHeadTs = rTsB.eval(rHead)
          } else rHead = null
        advanceRight()

        // one left row → its joined row, or null when unmatched in
        // inner mode (the caller loop skips it)
        private def step(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyB.eval(l)
          val lts = lTsB.eval(l)
          // a match from an earlier key group can never apply
          if (matchRow != null && keyOrd.compare(matchKey, lk) != 0)
            matchRow = null
          // skip right rows from keys before this one
          while (rHead != null && keyOrd.compare(rHeadKey, lk) < 0)
            advanceRight()
          // absorb every same-key right row with ts <= left ts; the
          // LAST one absorbed is the as-of match (rows arrive ts-asc)
          while (rHead != null && keyOrd.compare(rHeadKey, lk) == 0 &&
              tsOrd.compare(rHeadTs, lts) <= 0) {
            matchRow = rHead
            matchKey = rHeadKey
            advanceRight()
          }
          if (matchRow != null) joined(l, matchRow)
          else if (outer) joined(l, nullRight)
          else null
        }

        private var pending: InternalRow = null

        override def hasNext: Boolean = {
          while (pending == null && lIter.hasNext) pending = step()
          pending != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("asof join")
          val out = pending
          pending = null
          out
        }
      }
      raw.map(proj)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinOps {

  /** Idempotently add the strategy to an existing session. */
  def register(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[ClassicSparkSession]
    if (!cs.experimental.extraStrategies.contains(AsOfJoinStrategy))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  /** `left ASOF LEFT JOIN right ON left.key = right.key AND
    * left.ts >= right.ts` — column names name the join inputs; the
    * right side's columns all come back nullable.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String): DataFrame =
    build(left, right, leftKey, leftTs, rightKey, rightTs, outer = true)

  /** Inner form — DuckDB's plain `ASOF JOIN`: left rows with no
    * same-key right row at-or-before their timestamp are DROPPED
    * instead of null-padded. Identical physical shape (two key
    * exchanges + sorted merge); the merge just skips unmatched lefts.
    */
  def asofJoinInner(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String): DataFrame =
    build(left, right, leftKey, leftTs, rightKey, rightTs, outer = false)

  /** BROADCAST left-outer as-of: the dimension side ships whole to
    * every executor and the fact side is NEVER shuffled or sorted (see
    * [[AsOfJoinBroadcastExec]]). Use when the right side is
    * dimension-sized; semantics identical to [[asofJoin]].
    */
  def asofJoinBroadcast(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String): DataFrame =
    build(left, right, leftKey, leftTs, rightKey, rightTs, outer = true,
      broadcast = true)

  /** Broadcast inner as-of (unmatched fact rows dropped). */
  def asofJoinBroadcastInner(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String): DataFrame =
    build(left, right, leftKey, leftTs, rightKey, rightTs, outer = false,
      broadcast = true)

  private def build(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String, outer: Boolean,
      broadcast: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column '$n' in ${p.output.map(_.name)}"))
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession],
      AsOfJoin(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTs), attr(rPlan, rightTs), outer, broadcast))
  }
}

/** BROADCAST as-of join — the zero-shuffle-on-the-fact-side form for
  * the dominant production shape: a huge event stream enriched against
  * a SMALL reference dimension (prices, configs, slowly-changing
  * profiles). [[AsOfJoinExec]] is the general form and pays the full
  * SMJ layout — both sides hash-exchanged on the key and sorted. When
  * the right side fits in a broadcast, none of that is necessary: ship
  * the dimension to every executor once, index it per key as
  * ts-sorted arrays (built ONCE per executor via a broadcast-id-keyed
  * cache, the HyperplaneSignatures pattern), and probe each fact row
  * with a binary search — the fact side keeps its incoming
  * partitioning AND ordering, exactly like Spark's own
  * BroadcastHashJoin vs SMJ trade.
  *
  * At 100 TB this is the difference between shuffling 100 TB of events
  * and shuffling nothing: requiredChildDistribution declares
  * UnspecifiedDistribution for the fact side and
  * BroadcastDistribution(IdentityBroadcastMode) for the dimension, so
  * EnsureRequirements plans a single BroadcastExchange on the small
  * side and leaves the big side's plan untouched (the x38 PlanSpec pin:
  * zero Exchange/Sort above the fact scan).
  *
  * Keys are single expressions (hashable evaluated values — long,
  * string, …); compose multi-column keys into one column first. Null
  * keys/ts on the fact side never match (outer null-extends them);
  * dimension rows with null key/ts are dropped at index build.
  */
case class AsOfJoinBroadcastExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    outer: Boolean = true) extends BinaryExecNode {

  // the per-executor index is a hash map over evaluated key VALUES;
  // InternalRow (struct) keys have identity equality and would never
  // match — fail at planning, not with silent empty results
  require(!leftKey.dataType.isInstanceOf[org.apache.spark.sql.types.StructType],
    "broadcast as-of: struct keys unsupported — compose a single key column")

  override def output: Seq[Attribute] =
    if (outer) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) ::
      Nil

  // the fact side passes through untouched: its partitioning AND
  // ordering survive (a downstream window/agg on the same key plans no
  // new exchange)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val tsOrd = TypeUtils.getInterpretedOrdering(rightTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val nRight = right.output.size
    val isOuter = outer
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val outAttrs = output
    left.execute().mapPartitionsInternal { lIter =>
      val index = AsOfJoinBroadcastExec.indexFor(
        bcast.id, bcast.value, rKeyB, rTsB, tsOrd)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      // emit UnsafeRows: a JoinedRow at the plan top breaks collect()
      // (getByteArrayRdd casts to UnsafeRow)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      lIter.flatMap { l =>
        val lk = lKeyB.eval(l)
        val lts = lTsB.eval(l)
        val m =
          if (lk == null || lts == null) null
          else index.get(lk) match {
            case Some((tss, rows)) =>
              // rightmost ts <= lts
              var lo = 0
              var hi = tss.length - 1
              var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (tsOrd.compare(tss(mid), lts) <= 0) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (ans >= 0) rows(ans) else null
            case None => null
          }
        if (m != null) Some(proj(joined(l, m)))
        else if (isOuter) Some(proj(joined(l, nullRight)))
        else None
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinBroadcastExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinBroadcastExec {
  // per-executor index cache keyed by broadcast id: every task of every
  // partition probes the SAME ts-sorted per-key arrays instead of
  // rebuilding them per task
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    Long, Map[Any, (Array[Any], Array[InternalRow])]]()

  private[graft] def indexFor(id: Long, rows: Array[InternalRow],
      rKeyB: Expression, rTsB: Expression,
      tsOrd: Ordering[Any]): Map[Any, (Array[Any], Array[InternalRow])] = {
    cache.computeIfAbsent(id, _ => {
      val byKey = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]
      rows.foreach { r =>
        val k = rKeyB.eval(r)
        val ts = rTsB.eval(r)
        if (k != null && ts != null)
          byKey.getOrElseUpdate(k,
            scala.collection.mutable.ArrayBuffer.empty) += ((ts, r.copy()))
      }
      byKey.iterator.map { case (k, buf) =>
        val sorted = buf.sortBy(_._1)(tsOrd)
        k -> ((sorted.map(_._1).toArray, sorted.map(_._2).toArray))
      }.toMap
    })
  }
}
