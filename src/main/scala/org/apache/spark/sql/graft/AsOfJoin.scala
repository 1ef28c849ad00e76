package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset,
  SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder}
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
    outer: Boolean = true) extends BinaryNode {

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
    case AsOfJoin(l, r, lk, rk, lts, rts, outer) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts,
        outer) :: Nil
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
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
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

  private def build(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String, outer: Boolean): DataFrame = {
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
        attr(lPlan, leftTs), attr(rPlan, rightTs), outer))
  }
}
