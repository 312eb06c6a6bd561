package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Backward as-of join — the one whole-operator semantic in this engine
  * that no Spark built-in or composition expresses as a single efficient
  * plan: for each left row, the single right row with equal key and the
  * greatest right time ≤ the left time. `isLeftOuter = false` drops
  * unmatched left rows (inner); `true` emits them with a null right side
  * (the common enrichment shape).
  *
  * Implemented the way SURVEY.md §7 reserves for genuinely missing
  * operators — custom `LogicalPlan` + `SparkStrategy` + `SparkPlan` —
  * rather than the window-over-union rewrite, which would force BOTH
  * sides through one sort partitioned only by key (hot keys serialize)
  * and materialize a filled column for every left row.
  *
  * Physical shape: children are hash-clustered on the key and sorted by
  * (key, time) — EnsureRequirements inserts the exchanges/sorts — then a
  * single streaming merge per partition holds O(1) state (the latest
  * right row seen for the current key). At 100 TB this is one shuffle per
  * side and no per-key buffering, the same cost model as a sort-merge
  * equi-join.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    isLeftOuter: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    if (isLeftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[AsOfJoinPlan]] → [[AsOfJoinExec]]. Injected per-session
  * via `experimental.extraStrategies` (see [[AsOfJoin.apply]]), which
  * prepends it to the planner's strategy list. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, outer) =>
      AsOfJoinExec(lk, rk, lt, rt, outer, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge backward as-of join. Requires both children clustered on
  * the join key and sorted by (key, time [, right tiebreak]); emits
  * left ⧺ right columns for every left row whose key has at least one
  * right row at-or-before it (plus null-extended unmatched left rows when
  * `isLeftOuter`).
  *
  * The merge keeps exactly one buffered right row (`heldRow`) — the
  * latest right row whose (key, time) is ≤ the current left row — so
  * memory is O(1) regardless of key group size, and each right row is
  * visited once per partition.
  *
  * Duplicate right (key, time) rows: the merge holds the LAST one in
  * sort order, so the required right ordering appends every remaining
  * orderable right column as a tiebreaker — the match is deterministically
  * the row greatest in that total order, stable across reruns,
  * partitionings, and input file order.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    isLeftOuter: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (isLeftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  /** The merge pairs child partitions 1:1 (`zipPartitions`), so both
    * sides must shuffle to exactly the same width. A custom binary node
    * is outside the join-node set AQE's partition coalescing is tested
    * against, so the width is pinned here — both exchanges are created
    * with `numShufflePartitions` partitions and AQE leaves pinned
    * exchanges alone — instead of relying on runtime coalescing staying
    * symmetric across the two children. */
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(leftKeys, requiredNumPartitions = n) ::
      ClusteredDistribution(rightKeys, requiredNumPartitions = n) :: Nil
  }

  /** Deterministic total order for the right side: (key, time) plus every
    * remaining orderable right column, so ties on (key, time) resolve
    * identically on any partitioning (last-wins = greatest by this order).
    */
  private def rightTiebreak: Seq[Expression] = {
    val used = (rightKeys :+ rightTime).collect { case a: Attribute => a.exprId }.toSet
    right.output.filterNot(a => used.contains(a.exprId))
      .filter(a => RowOrdering.isOrderable(a.dataType))
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val outer = isLeftOuter
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join children partition counts diverged " +
        s"(${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions}); " +
        "the pinned ClusteredDistribution contract was not honored")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val joined = new JoinedRow
      // Explicit BoundReferences: under left-outer the right fields must be
      // marked nullable even though the child attributes are not (binding
      // through BindReferences would inherit the child's non-nullable flag
      // and the generated projection would skip the null checks that
      // `nullRight` relies on).
      val resultProj = UnsafeProjection.create(
        (lOut ++ rOut).zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType,
            nullable = a.nullable || (outer && i >= lOut.size))
        })
      val nullRight = new GenericInternalRow(rOut.size)
      // Iterator rows are reused buffers: anything held across next() calls
      // (heldKey/heldRow) must be copied.
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var heldKey: UnsafeRow = null
      var heldRow: InternalRow = null
      // SQL join semantics: NULL keys/times never match (NULL = NULL is
      // not true), so null-keyed or null-timed rows are skipped on both
      // sides rather than compared (a raw RowOrdering would equate NULLs);
      // under left-outer they surface null-extended like any unmatched row.
      def advanceRightPastNulls(): Unit =
        while (rRow != null &&
            (rKeyProj(rRow).anyNull || rTsProj(rRow).isNullAt(0))) {
          rRow = if (rIter.hasNext) rIter.next() else null
        }
      advanceRightPastNulls()
      def unmatched(l: InternalRow): Iterator[InternalRow] =
        if (outer) Iterator.single(resultProj(joined(l, nullRight)))
        else Iterator.empty
      lIter.flatMap { l =>
        val curKey = lKeyProj(l)
        val curTsRow = lTsProj(l)
        if (curKey.anyNull || curTsRow.isNullAt(0)) unmatched(l)
        else {
          val curTs = curTsRow.getLong(0)
          var done = rRow == null
          while (!done) {
            val rk = rKeyProj(rRow)
            val cmp = keyOrd.compare(rk, curKey)
            if (cmp > 0 || (cmp == 0 && rTsProj(rRow).getLong(0) > curTs)) {
              done = true // right is ahead of this left row; stop advancing
            } else {
              if (cmp == 0) { heldKey = rk.copy(); heldRow = rRow.copy() }
              rRow = if (rIter.hasNext) rIter.next() else null
              advanceRightPastNulls()
              done = rRow == null
            }
          }
          if (heldKey != null && keyOrd.compare(heldKey, curKey) == 0)
            Iterator.single(resultProj(joined(l, heldRow)))
          else unmatched(l)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API. Column names must be disjoint across sides (rename the
  * right side first, as with any Spark self-join); times must be
  * long-backed (timestamp or long). `joinType` is "inner" (unmatched left
  * rows drop) or "left_outer"/"left" (they survive null-extended). */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      joinType: String = "inner"): DataFrame = {
    val isLeftOuter = joinType match {
      case "inner" => false
      case "left_outer" | "left" => true
      case other => throw new IllegalArgumentException(
        s"as-of join supports inner and left_outer, got $other")
    }
    val spark = left.sparkSession
    GraftShims.addStrategy(spark, AsOfJoinStrategy)
    val lp = GraftShims.analyzed(left)
    val rp = GraftShims.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    GraftShims.ofRows(spark,
      AsOfJoinPlan(lp, rp, Seq(attr(lp, leftKey)), Seq(attr(rp, rightKey)),
        attr(lp, leftTime), attr(rp, rightTime), isLeftOuter))
  }
}
