package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator: logical node → planner strategy
  * → physical operator (SURVEY.md §7.3 tier (c): custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan` via
  * `SparkSessionExtensions`).
  *
  * Why a custom operator: the built-in formulation
  * (`row_number().over(partitionBy(keys).orderBy(ord)) <= k`) must SORT
  * every group's full contents after the exchange, and ships every input
  * row through the shuffle. This operator plans like a partial aggregation:
  * a map-side phase keeps a bounded k-row heap per key (so at most
  * |keys-per-partition|·k rows enter the exchange), then a final phase
  * merges heaps after Spark inserts the key-clustered exchange demanded by
  * `requiredChildDistribution`. At 100 TB that is the difference between
  * shuffling the corpus and shuffling k rows per key — the ANN top-k
  * queries are exactly this shape.
  *
  * Results are identical to the window formulation when the ordering is
  * total per group (callers add a unique tie-break column, as the harness
  * queries do).
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** DataFrame-level API: columns by name, `(name, descending?)` ordering
    * (resolved against the analyzed child — Spark 4 Columns carry lazy
    * ColumnNode expressions that custom nodes can't resolve themselves).
    * Requires [[GraftExtensions]] (or [[TopKPerKeyStrategy]] injected) on
    * the session. */
  def apply(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)], k: Int)
      : DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"no column '$n' in ${analyzed.output.map(_.name)}"))
    val order = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftShims.ofRows(df.sparkSession,
      TopKPerKey(keys.map(attr(_)), order, k, analyzed))
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // partial (map-side prune) -> exchange (inserted by EnsureRequirements
      // for the final's required distribution) -> final merge
      val partial = TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial || keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering = GenerateOrdering.generate(orderExprs, childOutput)
      // max-heap under the requested ordering: head = worst kept row
      val heaps = new java.util.HashMap[InternalRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      rows.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrdering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (rowOrdering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
