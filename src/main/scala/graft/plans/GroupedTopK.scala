package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator custom plan (SURVEY §4.3 path c): grouped top-k.
  *
  * Spark expresses per-group top-k as window row_number + filter,
  * which SORTS every group fully before discarding all but k rows. At
  * 100 TB that sort dominates. This operator keeps a BOUNDED heap of
  * k rows per group inside each partition — O(n log k) work, O(groups
  * × k) memory, no per-group sort — after one clustering shuffle that
  * `EnsureRequirements` inserts from the declared distribution.
  *
  * Full extension stack: logical node → strategy (injected via
  * GraftExtensions) → physical exec. Rows surviving the heap are NOT
  * in a defined order; callers apply their own presentation sort —
  * which keeps the operator semantics deterministic as a SET.
  */
case class GroupedTopKNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
    copy(child = newChild)
}

case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** One clustering shuffle on the group key — same groups land in
    * the same partition, so per-partition heaps are exact. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val groupLocal = groupExprs
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val ordering = GenerateOrdering.generate(orderLocal, childOutput)
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue
              .empty[InternalRow](ordering) // head = worst retained row
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap += row.copy()
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to the exec (injected by
  * graft.GraftExtensions). */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(group, order, k, child) =>
      GroupedTopKExec(group, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {
  /** Library API: best-k rows per group under the given order keys
    * (`(name, true)` = ascending / smallest first). Keys are resolved
    * by name against `df` — project computed keys into columns first.
    * Follow with a presentation sort: row order within the result is
    * unspecified. */
  def topkPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val plan = df.queryExecution.analyzed
    def attr(name: String) = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not in ${plan.output.map(_.name).mkString(", ")}"))
    val sortOrder = orderBy.map { case (name, asc) =>
      SortOrder(attr(name),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    ColumnBridge.ofRows(df.sparkSession,
      GroupedTopKNode(groupCols.map(attr), sortOrder, k, plan))
  }
}
