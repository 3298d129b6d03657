package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlInternal, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.SparkSessionExtensions

/** KEYED AS-OF JOIN as a first-class Catalyst operator — the brief's
  * escalation path (c): a custom `LogicalPlan` node, a planner
  * `SparkStrategy`, and a physical `SparkPlan` doing a true sorted MERGE
  * sweep, registered via [[GraftExtensions]] (`SparkSessionExtensions`)
  * or per-session through `experimental.extraStrategies`.
  *
  * WHY a custom operator (vs the composed union+window plan in
  * [[graft.ops.Joins.asofJoin]], reference semantics
  * /root/reference/src/tech/v3/dataset/join.clj:204-266): the composed
  * plan must union both sides into one schema, carry the right payload
  * as a struct through a per-key window, and re-split — three extra
  * full-width passes over the unioned data. The merge exec consumes the
  * two sides DIRECTLY: Spark's own EnsureRequirements plants one hash
  * shuffle + one sort per side (exactly a sort-merge join's wiring —
  * requiredChildDistribution/Ordering say so declaratively, so AQE,
  * reuse, and bucketed inputs all work), and the per-partition sweep is
  * a two-pointer scan: O(n+m), one pass, zero extra materialization.
  * At 100 TB this is the same shuffle bill as any equi-join on the key —
  * the minimum an as-of join can pay.
  *
  * Semantics (pinned to the composed op by `AsofMergeSpec` fuzz):
  *  - backward (`forward = false`): match = LAST right row with
  *    rt < lt (strict) / rt ≤ lt (allowExact);
  *  - forward: match = FIRST right row with rt > lt / rt ≥ lt;
  *  - nearest (`nearest = true`, `forward` ignored): match = the right
  *    row minimizing |rt - lt|, backward candidate winning distance ties
  *    (the composed asofNearest's tie rule); exact matches always count;
  *  - right rows with a null time or any null key never match (filtered
  *    in the exec); left rows with a null time or any null key surface
  *    with a null payload (object-space nil ≠ nil, like the reference).
  *
  * DUPLICATE (key, time) RIGHT ROWS are resolved deterministically: the
  * right side's required ordering appends every remaining ORDERABLE right
  * column as a tiebreaker, so the sweep always sees duplicates in one
  * fixed order — backward/nearest-backward keep the LAST of the group
  * (greatest in tiebreak order), forward/nearest-forward the FIRST
  * (least). Rows identical in every orderable column are
  * indistinguishable, so the choice among them cannot affect output.
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                    leftTime: Expression, rightTime: Expression,
                    forward: Boolean, allowExact: Boolean,
                    nearest: Boolean = false)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, fwd, ex, near) =>
      AsofJoinExec(lk, rk, lt, rt, fwd, ex, near,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Register via `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
}

case class AsofJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        forward: Boolean, allowExact: Boolean,
                        nearest: Boolean,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // a sort-merge join's wiring: co-clustered on the by-keys, each side
  // sorted (keys..., time) — EnsureRequirements plants the (single)
  // shuffle and sorts; bucketed/pre-sorted children plan with neither
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    // deterministic duplicate-(key, time) resolution: every remaining
    // ORDERABLE right column joins the sort as a tiebreaker, so the sweep
    // sees duplicates in one fixed order regardless of shuffle tie order
    val rKeySet = rightKeys.toSet ++ Set[Expression](rightTime)
    val tiebreak = right.output
      .filterNot(a => rKeySet.exists(_.semanticEquals(a)))
      .filter(a => RowOrdering.isOrderable(a.dataType))
      .map(a => SortOrder(a, Ascending))
    Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      (rightKeys.map(SortOrder(_, Ascending)) :+
        SortOrder(rightTime, Ascending)) ++ tiebreak)
  }

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    require(rightTime.dataType == timeType,
      s"asof time types must match: $timeType vs ${rightTime.dataType}")
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lOut = left.output
    val rOut = right.output
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val fwd = forward
    val exact = allowExact
    val near = nearest
    val outAttrs = output
    val rWidth = rOut.size
    // nearest needs numeric time distances; raw internal values are fine
    // (micros/days/etc differ from the composed plan's cast("double")
    // seconds only by a positive scale factor — |a-b| comparisons agree)
    val timeAsDouble: InternalRow => Double = {
      import org.apache.spark.sql.types._
      timeType match {
        case ByteType => r => r.getByte(0).toDouble
        case ShortType => r => r.getShort(0).toDouble
        case IntegerType | DateType => r => r.getInt(0).toDouble
        case LongType | TimestampType | TimestampNTZType =>
          r => r.getLong(0).toDouble
        case FloatType => r => r.getFloat(0).toDouble
        case DoubleType => r => r.getDouble(0)
        case d: DecimalType => r => r.getDecimal(0, d.precision, d.scale).toDouble
        case other =>
          if (near) throw new IllegalArgumentException(
            s"asof nearest: unsupported time type $other")
          else _ => 0.0
      }
    }
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow

      // right side: rows that can never match are dropped up front
      val rClean = rIt.filter { r =>
        !rKeyProj(r).anyNull && !rTimeProj(r).isNullAt(0)
      }
      var rHead: UnsafeRow = null        // current right row (copied)
      var rHeadKey: UnsafeRow = null
      var rHeadTime: UnsafeRow = null
      def advanceRight(): Unit =
        if (rClean.hasNext) {
          val r = rClean.next()
          rHead = r.asInstanceOf[UnsafeRow].copy()
          rHeadKey = rKeyProj(rHead).copy()
          rHeadTime = rTimeProj(rHead).copy()
        } else { rHead = null; rHeadKey = null; rHeadTime = null }
      advanceRight()

      var lastMatch: UnsafeRow = null    // backward: best-so-far
      var lastMatchKey: UnsafeRow = null
      var lastMatchTime: UnsafeRow = null

      lIt.map { lrow =>
        val lkey = lKeyProj(lrow)
        val ltime = lTimeProj(lrow)
        val m: InternalRow =
          if (lkey.anyNull || ltime.isNullAt(0)) nullRight
          else {
            // drop rights from keys before this one
            while (rHead != null && keyOrd.compare(rHeadKey, lkey) < 0) {
              advanceRight()
            }
            if (near) {
              // consume rights with rt <= lt (exact always counts for
              // nearest): lastMatch = backward candidate; after the loop
              // rHead (same key) = first rt > lt = forward candidate
              while (rHead != null && keyOrd.compare(rHeadKey, lkey) == 0 &&
                     timeOrd.compare(rHeadTime, ltime) <= 0) {
                lastMatch = rHead; lastMatchKey = rHeadKey
                lastMatchTime = rHeadTime
                advanceRight()
              }
              val b = if (lastMatch != null &&
                keyOrd.compare(lastMatchKey, lkey) == 0) lastMatch else null
              val f = if (rHead != null &&
                keyOrd.compare(rHeadKey, lkey) == 0) rHead else null
              if (b == null && f == null) nullRight
              else if (f == null) b
              else if (b == null) f
              else {
                // FORWARD wins distance ties (reference join.clj
                // abs-diff-bin-pred: keep current only when STRICTLY
                // closer than next; composed asofNearest matches)
                val lt = timeAsDouble(ltime)
                if (math.abs(lt - timeAsDouble(lastMatchTime)) <
                    math.abs(timeAsDouble(rHeadTime) - lt)) b else f
              }
            } else if (fwd) {
              // first right in this key with rt > lt (or ≥ when exact)
              while (rHead != null && keyOrd.compare(rHeadKey, lkey) == 0 &&
                     (if (exact) timeOrd.compare(rHeadTime, ltime) < 0
                      else timeOrd.compare(rHeadTime, ltime) <= 0)) {
                advanceRight()
              }
              if (rHead != null && keyOrd.compare(rHeadKey, lkey) == 0) rHead
              else nullRight
            } else {
              // last right in this key with rt < lt (or ≤ when exact)
              while (rHead != null && keyOrd.compare(rHeadKey, lkey) == 0 &&
                     (if (exact) timeOrd.compare(rHeadTime, ltime) <= 0
                      else timeOrd.compare(rHeadTime, ltime) < 0)) {
                lastMatch = rHead; lastMatchKey = rHeadKey
                lastMatchTime = rHeadTime
                advanceRight()
              }
              if (lastMatch != null &&
                  keyOrd.compare(lastMatchKey, lkey) == 0) lastMatch
              else nullRight
            }
          }
        resultProj(joined(lrow, m))
      }
    }
  }
}

/** DataFrame-level API over the custom operator. */
object AsofMerge {

  /** Keyed as-of join through [[AsofJoinExec]]. Output contract matches
    * [[graft.ops.Joins.asofJoin]]: every left column, then the right
    * payload (right time included) with name collisions prefixed
    * `right.`; right by-key columns are dropped. */
  def asofJoinMerge(left: DataFrame, right: DataFrame,
                    leftTime: String, rightTime: String,
                    by: Seq[(String, String)],
                    forward: Boolean = false,
                    allowExactMatch: Boolean = true,
                    nearest: Boolean = false): DataFrame = {
    require(by.nonEmpty, "asofJoinMerge is the KEYED path; " +
      "use Joins.asofJoin for the keyless bucketed plan")
    val spark: SparkSession = left.sparkSession
    GraftSqlInternal.addStrategy(spark, AsofJoinStrategy)
    import org.apache.spark.sql.functions.col
    // rename right payload to the output contract up front (right by-keys
    // dropped after the join; collisions get the right. prefix)
    val byRight = by.map(_._2)
    val renamed = right.columns.map { c =>
      if (byRight.contains(c)) c
      else if (left.columns.contains(c)) s"right.$c" else c
    }
    val r2 = right.toDF(renamed.toSeq: _*)
    val rTimeName = if (left.columns.contains(rightTime) &&
      !byRight.contains(rightTime)) s"right.$rightTime" else rightTime
    // time types must agree for the merge comparator
    val lPlan = GraftSqlInternal.analyzed(left)
    val rPlan0 = GraftSqlInternal.analyzed(r2)
    val lt = lPlan.output.find(_.name == leftTime).getOrElse(
      sys.error(s"no column $leftTime"))
    val rt0 = rPlan0.output.find(_.name == rTimeName).getOrElse(
      sys.error(s"no column $rTimeName"))
    // mixed time types (timestamp vs timestamp_ntz, int vs long, date vs
    // timestamp) compare through Spark's own union-widening rule, exactly
    // like the composed plan's unionByName coercion — the Cast wraps only
    // the COMPARATOR expressions; output columns keep their source types
    val (ltE: Expression, rtE: Expression) =
      if (lt.dataType == rt0.dataType) (lt, rt0)
      else {
        val common = GraftSqlInternal.widerTypeForTwo(lt.dataType, rt0.dataType)
          .getOrElse(throw new IllegalArgumentException(
            s"asof time types incompatible (${lt.dataType} vs " +
              s"${rt0.dataType}); cast before joining"))
        val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
        (org.apache.spark.sql.catalyst.expressions.Cast(lt, common, tz),
          org.apache.spark.sql.catalyst.expressions.Cast(rt0, common, tz))
      }
    val lk = by.map(b => lPlan.output.find(_.name == b._1).getOrElse(
      sys.error(s"no left key ${b._1}")))
    val rk = by.map(b => rPlan0.output.find(_.name == b._2).getOrElse(
      sys.error(s"no right key ${b._2}")))
    val joined = GraftSqlInternal.ofRows(spark,
      AsofJoin(lPlan, rPlan0, lk, rk, ltE, rtE, forward, allowExactMatch,
        nearest))
    // drop the right by-keys POSITIONALLY (a name-based drop would also
    // take the left key of the same name): unique temp names, select,
    // restore
    val lCols = left.columns.toSeq
    val rCols = r2.columns.toSeq
    val tmp = lCols.indices.map(i => s"__l$i") ++
      rCols.indices.map(i => s"__r$i")
    joined.toDF(tmp: _*).select(
      lCols.indices.map(i => col(s"__l$i").as(lCols(i))) ++
        rCols.zipWithIndex.collect {
          case (c, i) if !byRight.contains(c) => col(s"__r$i").as(c)
        }: _*)
  }
}
