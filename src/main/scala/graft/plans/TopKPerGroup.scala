package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k-per-group as a first-class operator (SURVEY §2c.24, the custom
  * `LogicalPlan` + `Strategy` + `SparkPlan` ladder rung).
  *
  * The window formulation (`row_number().over(partitionBy(...).orderBy(...))
  * <= k`) must shuffle and FULLY SORT every group before discarding all but
  * k rows. This operator keeps a bounded heap of k rows per group: a partial
  * pass runs on each input partition (map-side, no sort, O(n log k)), the
  * planner inserts one hash exchange on the group keys, and a final pass
  * merges the per-partition winners. At 100 TB that turns "sort everything"
  * into "stream everything through k-sized heaps" — shuffle traffic is
  * bounded by (partitions × groups × k), not the input.
  *
  * Memory contract: each task holds one k-row heap per DISTINCT group in
  * its partition, in heap memory, with no spill — task memory is
  * O(groups-per-task × k × rowSize). That is the win for the usual
  * "top-k within a modest number of categories" shape; for extreme group
  * cardinality (hundreds of millions of near-unique keys per task) the
  * window formulation's sort-and-spill is the safer plan — size
  * partitions (or skip the rewrite) accordingly. TopKRewrite also
  * declines floating-point group keys: NormalizeFloatingNumbers
  * canonicalizes -0.0/NaN for Window keys but runs after the rewrite and
  * never matches this node, so byte-level grouping would split -0.0/0.0
  * groups.
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val sOrder = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val ordering = RowOrdering.create(sOrder, childOutput)
      // per group: max-heap under the sort order, head = worst kept row
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        // copy the key ONLY on first sight of a group — getOrElseUpdate's
        // key argument is by-value, so key.copy() there allocated a fresh
        // UnsafeRow per INPUT ROW (billions of short-lived allocations on
        // the scans this operator exists for, for a map of a few groups)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable
              .PriorityQueue.empty[InternalRow](ordering)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      // emit each group's survivors in sort order (deterministic)
      heaps.valuesIterator.flatMap(h => h.toSeq.sorted(ordering).iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** Planner rule: partial per-partition top-k, exchange on group keys
  * (inserted by EnsureRequirements), final merge — the HashAggregate
  * two-phase shape applied to top-k.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Public API: `TopK.perGroup(df, groupCols, orderCols, k)`. Registers the
  * strategy on the DataFrame's session (idempotent) and builds the custom
  * logical node.
  */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val g = groupCols.map(GraftSqlBridge.expression)
    val o = orderCols.map(GraftSqlBridge.expression).map {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerGroup(g, o, k, GraftSqlBridge.logicalPlan(df)))
  }
}
