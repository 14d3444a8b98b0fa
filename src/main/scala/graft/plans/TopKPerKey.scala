package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Descending
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

import scala.collection.mutable

/** Whole-operator custom plan: per-key top-k — the rung-(c) path of the
  * custom-operator preference order (LogicalPlan + SparkStrategy +
  * SparkPlan via SparkSessionExtensions).
  *
  * Why not just window row_number <= k? The window form sorts EVERY row
  * of every key group after a full shuffle. This operator keeps a
  * bounded heap per key and runs in two phases — a map-side partial
  * top-k before the exchange (shuffle volume drops to <= k rows per key
  * per input partition) and a final top-k after clustering by key —
  * the per-key analogue of TakeOrderedAndProject, which is what makes
  * "rank <= 3 of 10^9 rows per key" feasible at 100 TB.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, schema).asInstanceOf[Ordering[InternalRow]]
      // max-heap per key (PriorityQueue dequeues the largest = worst of
      // the kept k, which is exactly the eviction candidate)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.toSeq.sorted(ord).iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Strategy: lower the logical node into partial + final exec pair. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Public API. Columns are referenced by name and resolved here against
  * the child's output (a Column-based variant would hand the analyzer
  * unresolved ColumnNode wrappers it won't resolve inside a custom
  * node); pre-project for computed keys or orders. */
object TopKPerKey {

  /** First k rows per key in the given sort order. `orderBy` pairs are
    * (columnName, ascending); pass a total order for determinism. */
  def apply(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val child = df.queryExecution.analyzed
    def attr(name: String) = child.output.find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val sortOrder = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    Bridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keys.map(attr), sortOrder, k, child))
  }
}
