package org.apache.spark.sql.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset,
  SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Keyed interval join as a first-class operator (the second rung-(c)
  * operator after [[AsOfJoin]]): every left row carries an interval
  * `[start, end]`, every right row a point `ts`; emit (left, right) for
  * each same-key pair with `start <= ts <= end` (inner join, inclusive
  * bounds).
  *
  * The composition alternative (x04's bucketed equi-join) explodes each
  * probe row into two width-buckets and post-filters — 2× probe rows
  * through the shuffle and a fixed bucket width baked into the plan.
  * This operator is the textbook plane-sweep: co-partition by key, sort
  * left by (key, start) and right by (key, ts), then one forward pass
  * holding only the OPEN intervals (start <= ts, not yet expired). No
  * explode, no width parameter, no post-filter.
  *
  * Scale shape: requiredChildDistribution/Ordering hand Exchange+Sort
  * planning to EnsureRequirements — the layout is exactly a
  * SortMergeJoin's, so 100 TB behavior (spillable sorts, co-partitioned
  * probes) is SMJ behavior. Per-partition state is the maximum number of
  * intervals CONCURRENTLY open at one timestamp for one key (for
  * sessions-on-events shapes, the per-user overlap, typically tiny) —
  * never the partition size. Expired intervals are swept out of the
  * buffer on every key/ts advance.
  */
case class IntervalJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftStart: Expression, leftEnd: Expression,
    rightTs: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoin]] as [[IntervalJoinExec]] (see
  * [[IntervalJoinOps.register]] / the GraftExtensions hook).
  */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, lk, rk, ls, le, rts) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, ls, le, rts) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftStart: Expression, leftEnd: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftStart, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = right.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lStartB = BindReferences.bindReference(leftStart, left.output)
    val lEndB = BindReferences.bindReference(leftEnd, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(rightTs.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        // open left intervals for the key under merge: (row, start, end)
        private val open = new ArrayBuffer[(InternalRow, Any, Any)]
        private var openKey: Any = null
        // left lookahead (copied — upstream sorters reuse row memory)
        private var lHead: InternalRow = null
        private var lHeadKey: Any = null
        private var lHeadStart: Any = null
        private def advanceLeft(): Unit =
          if (lIter.hasNext) {
            lHead = lIter.next().copy()
            lHeadKey = lKeyB.eval(lHead)
            lHeadStart = lStartB.eval(lHead)
          } else lHead = null
        advanceLeft()

        // matches pending for the current right row
        private var rRow: InternalRow = null
        private var pending: Iterator[InternalRow] = Iterator.empty

        private def refill(): Unit = {
          while (!pending.hasNext && rIter.hasNext) {
            rRow = rIter.next()
            val rk = rKeyB.eval(rRow)
            val ts = rTsB.eval(rRow)
            // new key group → the old buffer can never match again
            if (openKey == null || keyOrd.compare(openKey, rk) != 0) {
              open.clear()
              openKey = rk
            }
            // skip left groups entirely before this key
            while (lHead != null && keyOrd.compare(lHeadKey, rk) < 0)
              advanceLeft()
            // admit every same-key interval that has started by ts
            while (lHead != null && keyOrd.compare(lHeadKey, rk) == 0 &&
                tsOrd.compare(lHeadStart, ts) <= 0) {
              open += ((lHead, lHeadStart, lEndB.eval(lHead)))
              advanceLeft()
            }
            // sweep out expired intervals (end < ts) and emit the rest
            var i = 0
            while (i < open.length) {
              if (tsOrd.compare(open(i)._3, ts) < 0) open.remove(i)
              else i += 1
            }
            if (open.nonEmpty) {
              val r = rRow.copy()
              pending = open.toArray.iterator.map(o => joined(o._1, r))
            }
          }
        }

        override def hasNext: Boolean = {
          if (!pending.hasNext) refill()
          pending.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          pending.next()
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinOps {

  /** Idempotently add the strategy to an existing session. */
  def register(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[ClassicSparkSession]
    if (!cs.experimental.extraStrategies.contains(IntervalJoinStrategy))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ IntervalJoinStrategy
  }

  /** `left JOIN right ON left.key = right.key AND right.ts BETWEEN
    * left.start AND left.end` (inclusive, inner). Null keys/bounds/ts
    * are pre-filtered — SQL inner-join semantics (a null never equals,
    * a null bound never brackets).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, leftStart: String, leftEnd: String,
      rightKey: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    def nn(df: DataFrame, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) =>
        d.filter(org.apache.spark.sql.functions.col(c).isNotNull))
    val lPlan = nn(left, leftKey, leftStart, leftEnd)
      .queryExecution.analyzed
    val rPlan = nn(right, rightKey, rightTs).queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"intervalJoin: no column '$n' in ${p.output.map(_.name)}"))
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession],
      IntervalJoin(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftStart), attr(lPlan, leftEnd),
        attr(rPlan, rightTs)))
  }
}
