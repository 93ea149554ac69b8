package graft.plans

import java.util.{HashMap => JHashMap, PriorityQueue => JPriorityQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator custom plan: top-k rows per group under an ordering.
  *
  * Why a custom operator: the composable form (`row_number().over(w)
  * .filter(rn <= k)`) fully sorts every partition of every group before
  * discarding all but k rows — O(n log n) per group and a full
  * materialized sort at 100 TB. This operator keeps a bounded k-row
  * binary heap per group in a single pass — O(n log k), no sort buffer,
  * spill-free for realistic k — the same trick Spark itself applies
  * globally in TakeOrderedAndProject, generalized to per-group.
  *
  * Wiring: logical node → Strategy → exec node, the (c) tier of the
  * custom-operator ladder. Distribution is declared, not hand-built:
  * `requiredChildDistribution = ClusteredDistribution(groupExprs)` lets
  * EnsureRequirements plan the exchange (and AQE re-plan it at runtime).
  */
case class TopKPerGroupLogical(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupLogical =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // SQL group semantics for floats: -0.0 groups with 0.0 and all NaN bit
  // patterns group together. Joins/aggregates get this from the
  // NormalizeFloatingNumbers rule; a custom node must normalize itself,
  // both for the hash partitioning and for the in-task map key.
  private lazy val normalizedGroup: Seq[Expression] =
    groupExprs.map(ColumnBridge.normalizeFloats)

  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(normalizedGroup) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val (g, o, kk) = (normalizedGroup, orderExprs, k)
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(g, schema)
      val ordering: Ordering[InternalRow] = RowOrdering.create(o, schema)
      // head of each heap = current worst of the group's best k
      val worstFirst = ordering.reverse
      val heaps = new JHashMap[UnsafeRow, JPriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new JPriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.offer(row.copy())
        else if (ordering.lt(row, heap.peek())) {
          heap.poll()
          heap.offer(row.copy())
        }
      }
      heaps.values.asScala.iterator.flatMap { h =>
        h.asScala.toArray.sorted(ordering).iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupLogical(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Column-level API.
  *
  * Columns are referenced by name and resolved against the analyzed
  * child here (Spark 4's public Column is a lazy column-node facade the
  * analyzer only lowers through DataFrame API entry points — a custom
  * logical node must carry already-resolved catalyst expressions).
  */
object GraftOps {
  /** Top-k rows of `df` per group under `orderCols` (name → ascending?);
    * include a unique tiebreak column for determinism.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val child = df.queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    def attr(name: String): Attribute = {
      val matches = child.output.filter(a => resolver(a.name, name))
      require(matches.nonEmpty,
        s"column $name not in ${child.output.map(_.name).mkString(", ")}")
      require(matches.size == 1, s"column $name is ambiguous (${matches.size} matches)")
      matches.head
    }
    val sortOrders = orderCols.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark,
      TopKPerGroupLogical(groupCols.map(attr), sortOrders, k, child))
  }
}
