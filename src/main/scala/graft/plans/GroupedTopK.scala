package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType

/** The whole-operator custom-plan path (SURVEY §4 "custom" tier (c)):
  * per-group top-k as a first-class operator — logical node, planner
  * strategy, physical exec — registered through
  * `SparkSessionExtensions` (graft.functions.GraftExtensions).
  *
  * Why an operator and not `row_number().over(...) <= k`: the window
  * form SORTS every group's full row set (state = whole partition);
  * this exec keeps one k-bounded heap per group and never materializes
  * more than k rows per group — the difference between O(n log n) sort
  * state and O(groups·k) heap state on a 100 TB shuffle partition.
  * Output is identical to the window form (rank by the same order,
  * ties broken by the order expressions themselves), which the
  * `topk_cosine_exec` oracle row proves against the same DuckDB SQL as
  * the window-based `topk_cosine`.
  */
final case class GroupedTopK(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override protected def withNewChildInternal(newChild: LogicalPlan)
      : GroupedTopK = copy(child = newChild)
}

object GroupedTopK {
  /** Entry point: df grouped by `groupCols`, ranked by `orderCols`
    * ((name, ascending) pairs), keeping `k` rows per group with a
    * `rankName` column appended (1-based, like row_number). Columns
    * resolve by name against the analyzed child plan, so the custom
    * node enters the optimizer fully resolved.
    */
  def apply(df: DataFrame, groupCols: Seq[String],
            orderCols: Seq[(String, Boolean)],
            k: Int, rankName: String): DataFrame = {
    val analyzed = Bridge.analyzedPlan(df)
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name)}"))
    val plan = new GroupedTopK(
      groupCols.map(attr),
      orderCols.map { case (n, asc) =>
        SortOrder(attr(n),
          if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
          else org.apache.spark.sql.catalyst.expressions.Descending)
      },
      k, AttributeReference(rankName, LongType, nullable = false)(),
      analyzed)
    Bridge.ofRows(df.sparkSession, plan)
  }
}

/** Planner strategy: GroupedTopK → GroupedTopKExec. */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GroupedTopK =>
      GroupedTopKExec(g.groupExprs, g.order, g.k, g.rankAttr,
        planLater(g.child)) :: Nil
    case _ => Nil
  }
}

final case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupEs = groupExprs
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ rows =>
      val groupProj = UnsafeProjection.create(groupEs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // per group: a max-heap (reverse ordering) of the k best rows —
      // the heap head is the WORST retained row, evicted on a better
      // arrival. Memory: O(groups-in-partition × k), never the group's
      // full row set.
      val heaps = mutable.LinkedHashMap
        .empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      rows.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](ordering))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val out = UnsafeProjection.create(output, output)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(1)
      val rankIsLong = rankAttr.dataType == LongType
      heaps.iterator.flatMap { case (_, heap) =>
        val sorted = heap.dequeueAll.reverse // best-first
        sorted.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0,
            if (rankIsLong) (i + 1).toLong else i + 1)
          out(joined(row, rankRow)).copy()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : GroupedTopKExec = copy(child = newChild)
}
