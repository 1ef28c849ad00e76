package org.apache.spark.sql.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset,
  SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder,
  UnsafeProjection}
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
    rightTs: Expression, leftOuter: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoin]] as [[IntervalJoinExec]] (see
  * [[IntervalJoinOps.register]] / the GraftExtensions hook).
  */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, lk, rk, ls, le, rts, outer) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, ls, le, rts,
        outer) :: Nil
    case IntervalEnrich(l, r, lk, lts, rk, rs, re, outer) =>
      IntervalEnrichBroadcastExec(planLater(l), planLater(r), lk, lts,
        rk, rs, re, outer) :: Nil
    case _ => Nil
  }
}

/** Logical node for [[IntervalEnrichBroadcastExec]]: POINTS on the
  * left, broadcast-sized INTERVALS on the right.
  */
case class IntervalEnrich(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightStart: Expression, rightEnd: Expression,
    outer: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    if (outer) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalEnrich =
    copy(left = newLeft, right = newRight)
}

case class IntervalJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftStart: Expression, leftEnd: Expression,
    rightTs: Expression, leftOuter: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftStart, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // every output row carries this partition's LEFT columns (matched or
  // null-extended), so the left child's clustering is the claim that
  // holds in both modes; for inner, right's holds too
  override def outputPartitioning: Partitioning =
    if (leftOuter) left.outputPartitioning else right.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lStartB = BindReferences.bindReference(leftStart, left.output)
    val lEndB = BindReferences.bindReference(leftEnd, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(rightTs.dataType)
    val isOuter = leftOuter
    val nRight = right.output.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // emit UnsafeRows (collect()-safe without a projection above)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val raw = new Iterator[InternalRow] {
        private val joined = new JoinedRow
        // all-null right extension for unmatched left rows (outer only);
        // immutable, safe to share across emitted rows
        private val nullRight =
          new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(nRight)
        // unmatched left rows awaiting emission (outer only). Each gets
        // its OWN JoinedRow: `joined` is reused by the pending iterator
        // and would corrupt queued rows.
        private val unmatched =
          new scala.collection.mutable.Queue[InternalRow]
        private def emitUnmatched(lRow: InternalRow): Unit =
          if (isOuter) unmatched.enqueue(new JoinedRow(lRow, nullRight))

        // open left intervals for the key under merge: (row, start, end)
        private val open = new ArrayBuffer[(InternalRow, Any, Any)]
        private var openKey: Any = null
        // left lookahead (copied — upstream sorters reuse row memory).
        // Rows with a null key/start/end can never bracket any point
        // (SQL comparison semantics): inner drops them, outer emits them
        // null-extended — so the merge below only ever sees non-null
        // keys and bounds.
        private var lHead: InternalRow = null
        private var lHeadKey: Any = null
        private var lHeadStart: Any = null
        private var lHeadEnd: Any = null
        private def advanceLeft(): Unit = {
          while (lIter.hasNext) {
            val row = lIter.next().copy()
            val k = lKeyB.eval(row)
            val s = lStartB.eval(row)
            val e = lEndB.eval(row)
            if (k == null || s == null || e == null) emitUnmatched(row)
            else {
              lHead = row; lHeadKey = k; lHeadStart = s; lHeadEnd = e
              return
            }
          }
          lHead = null
        }
        advanceLeft()

        // matches pending for the current right row
        private var rRow: InternalRow = null
        private var pending: Iterator[InternalRow] = Iterator.empty

        private def refill(): Unit = {
          while (!pending.hasNext && unmatched.isEmpty && rIter.hasNext) {
            rRow = rIter.next()
            val rk = rKeyB.eval(rRow)
            val ts = rTsB.eval(rRow)
            if (rk != null && ts != null) {
              // new key group → the old buffer can never match again
              if (openKey == null || keyOrd.compare(openKey, rk) != 0) {
                open.clear()
                openKey = rk
              }
              // skip left groups entirely before this key — no right row
              // for their key can follow, so (outer) they are unmatched
              while (lHead != null && keyOrd.compare(lHeadKey, rk) < 0) {
                emitUnmatched(lHead)
                advanceLeft()
              }
              // admit every same-key interval that has started by ts.
              // This right row is the FIRST with ts >= start (earlier
              // same-key rows had smaller ts and didn't admit it), so an
              // interval with end < ts can never match anything: reject
              // it here (outer: null-extend) instead of buffering it.
              while (lHead != null && keyOrd.compare(lHeadKey, rk) == 0 &&
                  tsOrd.compare(lHeadStart, ts) <= 0) {
                if (tsOrd.compare(lHeadEnd, ts) < 0) emitUnmatched(lHead)
                else open += ((lHead, lHeadStart, lHeadEnd))
                advanceLeft()
              }
              // sweep out expired intervals (end < ts): each survived an
              // earlier emit (admission rejects never-matching rows), so
              // expiry needs no null extension
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
          // right exhausted: every left row still pending was never
          // admitted — unmatched (outer). Buffered `open` rows matched.
          if (isOuter && !pending.hasNext && unmatched.isEmpty &&
              !rIter.hasNext) {
            while (unmatched.isEmpty && lHead != null) {
              emitUnmatched(lHead)
              advanceLeft()
            }
          }
        }

        override def hasNext: Boolean = {
          if (!pending.hasNext && unmatched.isEmpty) refill()
          pending.hasNext || unmatched.nonEmpty
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          if (pending.hasNext) pending.next() else unmatched.dequeue()
        }
      }
      raw.map(proj)
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
      rightKey: String, rightTs: String): DataFrame =
    build(left, right, leftKey, leftStart, leftEnd, rightKey, rightTs,
      leftOuter = false)

  /** `left LEFT JOIN right ON …` — every left interval appears at least
    * once; those bracketing no point get a null-extended right side
    * (matching the streaming tier's s23 left-outer contract). Left rows
    * with null key/bounds are kept (null-extended, SQL LEFT JOIN
    * semantics); right rows with null key/ts are dropped inside the
    * operator (they can never match, and unmatched RIGHT rows are not
    * this join's output).
    */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
      leftKey: String, leftStart: String, leftEnd: String,
      rightKey: String, rightTs: String): DataFrame =
    build(left, right, leftKey, leftStart, leftEnd, rightKey, rightTs,
      leftOuter = true)

  /** Broadcast point-in-interval enrichment: every point (left) is
    * joined with EVERY same-key broadcast interval containing its
    * timestamp (inclusive bounds); `outer` keeps interval-less points
    * null-extended. The fact side is never shuffled or sorted — see
    * [[IntervalEnrichBroadcastExec]].
    */
  def pointInIntervalBroadcast(points: DataFrame, intervals: DataFrame,
      pointKey: String, pointTs: String,
      intervalKey: String, intervalStart: String, intervalEnd: String,
      outer: Boolean = false): DataFrame = {
    val spark = points.sparkSession
    register(spark)
    def nn(df: DataFrame, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) =>
        d.filter(org.apache.spark.sql.functions.col(c).isNotNull))
    // null-keyed/ts points never match: droppable for inner, kept and
    // null-extended by the exec for outer; null interval fields are
    // dropped at index build either way
    val lPlan = (if (outer) points else nn(points, pointKey, pointTs))
      .queryExecution.analyzed
    val rPlan = intervals.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"pointInIntervalBroadcast: no column '$n' in " +
            s"${p.output.map(_.name)}"))
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession],
      IntervalEnrich(lPlan, rPlan,
        attr(lPlan, pointKey), attr(lPlan, pointTs),
        attr(rPlan, intervalKey), attr(rPlan, intervalStart),
        attr(rPlan, intervalEnd), outer))
  }

  private def build(left: DataFrame, right: DataFrame,
      leftKey: String, leftStart: String, leftEnd: String,
      rightKey: String, rightTs: String, leftOuter: Boolean): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    def nn(df: DataFrame, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) =>
        d.filter(org.apache.spark.sql.functions.col(c).isNotNull))
    // inner may pre-filter left nulls (they never match); outer must
    // keep them — the exec null-extends them
    val lPlan = (if (leftOuter) left
      else nn(left, leftKey, leftStart, leftEnd))
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
        attr(rPlan, rightTs), leftOuter))
  }
}

/** Opt-in planner rule that routes a RECOGNIZED equi+range join pattern
  * in plain SQL/DataFrame code onto [[IntervalJoinExec]] — the
  * "optimizer picks the custom physical operator" tier: users write the
  * standard declarative form
  *
  * {{{
  *   SELECT ... FROM spans s JOIN events e
  *     ON s.key = e.key AND e.ts BETWEEN s.lo AND s.hi
  * }}}
  *
  * and, with `spark.graft.autoIntervalJoin=true`, planning swaps
  * Spark's SortMergeJoin-plus-residual-filter (which materializes the
  * full per-key cross product before filtering — O(n_k·m_k) on hot
  * keys) for the plane-sweep exec (O((n_k+m_k)·log + matches),
  * output-bound). Strictly semantics-preserving: inner equi+BETWEEN ==
  * the exec's contract (the x29 ScalaCheck property pins it against the
  * composable form), and the strategy fires only on the exact
  * recognizable shape —
  *
  *   - inner or left-outer join with a conjunctive condition,
  *   - >= 1 cross-side equality (several combine into a struct key),
  *   - exactly one two-sided inclusive range: `ts >= lo AND ts <= hi`
  *     (any conjunct order / mirrored comparisons), ts from one side,
  *     both bounds from the other,
  *   - nothing else in the condition.
  *
  * Anything off-pattern (strict bounds, residual predicates, full
  * outer) falls through to Spark's own planning untouched. Left-outer
  * routes only when the LEFT side owns the interval (the exec
  * null-extends its left). A point-side-on-the-left inner join plans
  * the exec with the sides swapped plus a ProjectExec to restore the
  * original column order. The strategy runs at PLANNING time, after the
  * optimizer — predicate pushdown, column pruning, and
  * InferFiltersFromConstraints have already shaped the children — and
  * adds its own IsNotNull guards on the exprs it binds (null keys,
  * bounds, or ts never match; the outer side's kept-left rows
  * null-extend as SQL requires).
  *
  * Registered by [[GraftExtensions]] but DEFAULT OFF
  * (`spark.graft.autoIntervalJoin`, session-settable) so existing plans
  * never change shape silently.
  */
object AutoIntervalJoinStrategy extends SparkStrategy {
  import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
  import org.apache.spark.sql.catalyst.plans.logical.Join
  import org.apache.spark.sql.catalyst.expressions.{And, CreateStruct,
    EqualTo, GreaterThanOrEqual, IsNotNull, LessThanOrEqual}
  import org.apache.spark.sql.execution.{FilterExec, ProjectExec}

  val ConfKey = "spark.graft.autoIntervalJoin"

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString(ConfKey, "false").toBoolean

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: Join if enabled &&
        (j.joinType == Inner || j.joinType == LeftOuter) &&
        j.condition.isDefined =>
      route(j).toSeq
    case _ => Nil
  }

  private def route(j: Join): Option[SparkPlan] = {
    val l = j.left
    val r = j.right
    val lOut = l.outputSet
    val rOut = r.outputSet
    // Some(true) = left-only references, Some(false) = right-only
    def side(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(lOut)) Some(true)
      else if (refs.subsetOf(rOut)) Some(false)
      else None
    }
    val eqs = ArrayBuffer.empty[(Expression, Expression)] // (lExpr, rExpr)
    val ineqs = ArrayBuffer.empty[(Expression, Expression)] // small <= large
    var onPattern = true
    conjuncts(j.condition.get).foreach {
      case EqualTo(a, b) if side(a) == Some(true) &&
          side(b) == Some(false) => eqs += ((a, b))
      case EqualTo(a, b) if side(a) == Some(false) &&
          side(b) == Some(true) => eqs += ((b, a))
      case GreaterThanOrEqual(a, b)
          if side(a).isDefined && side(b).isDefined &&
            side(a) != side(b) => ineqs += ((b, a))
      case LessThanOrEqual(a, b)
          if side(a).isDefined && side(b).isDefined &&
            side(a) != side(b) => ineqs += ((a, b))
      case _ => onPattern = false
    }
    if (!onPattern || eqs.isEmpty || ineqs.length != 2) return None
    // find ts: the expr that is the LARGE of one inequality and the
    // SMALL of the other, with both bounds on the opposite side
    def bracket(loI: (Expression, Expression),
        hiI: (Expression, Expression)): Option[(Expression, Expression, Expression)] = {
      val (lo, ts1) = loI
      val (ts2, hi) = hiI
      if (ts1.semanticEquals(ts2) && side(lo) == side(hi) &&
          side(ts1) != side(lo)) Some((ts1, lo, hi)) else None
    }
    val m = bracket(ineqs(0), ineqs(1)).orElse(bracket(ineqs(1), ineqs(0)))
    m.flatMap { case (ts, lo, hi) =>
      val pointOnLeft = side(ts) == Some(true)
      def key(es: Seq[Expression]): Expression =
        if (es.length == 1) es.head else CreateStruct(es)
      val lKey = key(eqs.map(_._1).toSeq)
      val rKey = key(eqs.map(_._2).toSeq)
      def notNull(exprs: Seq[Expression], child: SparkPlan): SparkPlan =
        FilterExec(exprs.map(IsNotNull(_): Expression).reduce(And), child)
      (j.joinType, pointOnLeft) match {
        case (Inner, false) =>
          // interval side left, point side right — the exec's layout
          Some(IntervalJoinExec(
            notNull(eqs.map(_._1).toSeq :+ lo :+ hi, planLater(l)),
            notNull(eqs.map(_._2).toSeq :+ ts, planLater(r)),
            lKey, rKey, lo, hi, ts))
        case (Inner, true) =>
          // point side is the JOIN's left: swap into the exec layout,
          // then restore the original attribute order
          val exec = IntervalJoinExec(
            notNull(eqs.map(_._2).toSeq :+ lo :+ hi, planLater(r)),
            notNull(eqs.map(_._1).toSeq :+ ts, planLater(l)),
            rKey, lKey, lo, hi, ts)
          Some(ProjectExec(j.output.map(a => a), exec))
        case (LeftOuter, false) =>
          // null-extend the exec's left == the join's left: routable
          Some(IntervalJoinExec(
            planLater(l),
            notNull(eqs.map(_._2).toSeq :+ ts, planLater(r)),
            lKey, rKey, lo, hi, ts, leftOuter = true))
        case _ => None // LEFT OUTER with the point on the left: not ours
      }
    }
  }
}

/** BROADCAST point-in-interval enrichment — the interval counterpart of
  * [[AsOfJoinBroadcastExec]], completing the custom-join matrix
  * (merge/broadcast × as-of/interval): a huge POINT stream (left)
  * enriched with every SMALL broadcast interval (right) of the same key
  * that contains its timestamp — "which maintenance window / config
  * epoch / rate-limit period does this event fall in". Multiplicity
  * follows SQL: one output row per containing interval; outer mode
  * null-extends points that fall in none.
  *
  * The plane-sweep [[IntervalJoinExec]] puts the INTERVALS on the left
  * and pays two key-partitioned sort exchanges; here the interval table
  * is dimension-sized by assumption, so it ships once per executor
  * (IdentityBroadcastMode), gets indexed per key as lo-sorted arrays
  * with a parallel running-max-of-hi (built once per executor,
  * broadcast-id-keyed cache), and each point probes by binary search on
  * lo then a bounded backward scan that the running-max prunes — the
  * fact side keeps its incoming partitioning and ordering, exactly like
  * [[AsOfJoinBroadcastExec]]. Single hashable keys only (struct keys
  * rejected at planning).
  */
case class IntervalEnrichBroadcastExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightStart: Expression, rightEnd: Expression,
    outer: Boolean = false) extends BinaryExecNode {

  require(!leftKey.dataType.isInstanceOf[org.apache.spark.sql.types.StructType],
    "broadcast interval enrich: struct keys unsupported — compose a " +
      "single key column")

  override def output: Seq[Attribute] =
    if (outer) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) ::
      Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rStartB = BindReferences.bindReference(rightStart, right.output)
    val rEndB = BindReferences.bindReference(rightEnd, right.output)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val nRight = right.output.size
    val isOuter = outer
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    val outAttrs = output
    left.execute().mapPartitionsInternal { lIter =>
      val index = IntervalEnrichBroadcastExec.indexFor(
        bcast.id, bcast.value, rKeyB, rStartB, rEndB, tsOrd)
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(nRight)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      lIter.flatMap { l =>
        val lk = lKeyB.eval(l)
        val lts = lTsB.eval(l)
        val matches: Iterator[InternalRow] =
          if (lk == null || lts == null) Iterator.empty
          else index.get(lk) match {
            case Some((los, maxHis, his, rows)) =>
              // rightmost interval with lo <= ts
              var lo = 0
              var hi = los.length - 1
              var last = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (tsOrd.compare(los(mid), lts) <= 0) { last = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              // scan backward over lo-eligible intervals; the running
              // max of hi prunes the walk as soon as no earlier
              // interval can still reach ts
              new Iterator[InternalRow] {
                private var i = last
                private var nxt: InternalRow = null
                private def advance(): Unit = {
                  nxt = null
                  while (nxt == null && i >= 0 &&
                      tsOrd.compare(maxHis(i), lts) >= 0) {
                    if (tsOrd.compare(his(i), lts) >= 0) nxt = rows(i)
                    i -= 1
                  }
                }
                advance()
                override def hasNext: Boolean = nxt != null
                override def next(): InternalRow = {
                  val r = nxt; advance(); r
                }
              }
            case None => Iterator.empty
          }
        if (matches.hasNext) matches.map(m => proj(joined(l, m)))
        else if (isOuter) Iterator.single(proj(joined(l, nullRight)))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalEnrichBroadcastExec =
    copy(left = newLeft, right = newRight)
}

object IntervalEnrichBroadcastExec {
  // per-executor index cache keyed by broadcast id (the
  // AsOfJoinBroadcastExec pattern): per key, intervals sorted by lo with
  // a parallel running max of hi for backward-scan pruning
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    Long, Map[Any, (Array[Any], Array[Any], Array[Any], Array[InternalRow])]]()

  private[graft] def indexFor(id: Long, rows: Array[InternalRow],
      rKeyB: Expression, rStartB: Expression, rEndB: Expression,
      tsOrd: Ordering[Any])
      : Map[Any, (Array[Any], Array[Any], Array[Any], Array[InternalRow])] =
    cache.computeIfAbsent(id, _ => {
      val byKey = scala.collection.mutable.HashMap.empty[Any,
        scala.collection.mutable.ArrayBuffer[(Any, Any, InternalRow)]]
      rows.foreach { r =>
        val k = rKeyB.eval(r)
        val lo = rStartB.eval(r)
        val hi = rEndB.eval(r)
        if (k != null && lo != null && hi != null)
          byKey.getOrElseUpdate(k,
            scala.collection.mutable.ArrayBuffer.empty) +=
            ((lo, hi, r.copy()))
      }
      byKey.iterator.map { case (k, buf) =>
        val sorted = buf.sortBy(_._1)(tsOrd)
        val los = sorted.map(_._1).toArray
        val his = sorted.map(_._2).toArray
        val maxHis = new Array[Any](his.length)
        var i = 0
        while (i < his.length) {
          maxHis(i) =
            if (i == 0) his(0)
            else if (tsOrd.compare(his(i), maxHis(i - 1)) >= 0) his(i)
            else maxHis(i - 1)
          i += 1
        }
        k -> ((los, maxHis, his, sorted.map(_._3).toArray))
      }.toMap
    })
}
