package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import scala.collection.mutable

/** Native per-key top-k — the whole-operator extension point (SURVEY
  * §7.3(c)): a custom LogicalPlan + SparkStrategy + physical SparkPlan.
  *
  * Spark expresses "top k rows per key" as row_number() over a
  * (partitionBy key, orderBy o) window + filter — WindowExec SORTS every
  * key's full row set even though only k rows survive. This operator keeps
  * a bounded heap of k rows per key instead: a PARTIAL pass trims every
  * input partition to ≤k rows per key map-side, the exchange then moves
  * only surviving rows, and the FINAL pass merges heaps per key — the
  * partial-aggregation shape applied to ranking. Per-partition memory is
  * |keys in partition|·k rows; nothing ever sorts more than k rows per
  * key. The q_topk_native oracle (a row_number window in DuckDB) proves
  * result equality with the window formulation.
  *
  * Reference analog: the reference's TakeOrdered-style limit
  * (/root/reference/src/execution/limit.rs) generalized per key.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    // the planner inserts the key exchange before the FINAL pass only;
    // the partial pass runs wherever the child's rows already are
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // hoist everything the task needs: the closure must not capture
    // `this` (a SparkPlan tree is not serializable)
    val localKeys = keys
    val localOrder = order
    val localK = k
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(localKeys, childOutput)
      val ord = new LazilyGeneratedOrdering(localOrder, childOutput)
      // per key: a bounded max-heap under `order` — the head is the WORST
      // kept row (scala.PriorityQueue dequeues the ordering's maximum),
      // so a candidate only displaces it when strictly better
      val heaps = mutable.HashMap.empty[UnsafeRow,
        mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < localK) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Optimizer rule (the Rule[LogicalPlan] extension point): rewrites the
  * canonical window top-k pattern
  *   Project(Filter(rn ≤ k, Window(row_number AS rn, part, order, child)))
  * into Project(TopKPerKey(part, order, k, child)) whenever the rank
  * column is DISCARDED by the projection — the window sort (and Spark's
  * own WindowGroupLimit pre-pass, which still sorts) disappear in favor
  * of the bounded-heap operator. Safe under the repo-wide total-order
  * convention: a query whose row_number order had ties could not pass its
  * cross-engine oracle in the first place, and with a total order the
  * window selection and the heap selection are the same set.
  */
object TopKRewrite extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CurrentRow, LessThan, LessThanOrEqual, Literal, NamedExpression, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window => LWindow, WindowGroupLimit}

  private def stripGroupLimit(plan: LogicalPlan): LogicalPlan = plan match {
    // our partial pass subsumes the pre-limit — keep the plan beneath it
    case WindowGroupLimit(_, _, _, _, child) => child
    case other => other
  }

  private def asRowNumberWindow(w: LWindow, rn: Attribute): Boolean =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame,
            UnboundedPreceding, CurrentRow))), _)) => a.exprId == rn.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projList, Filter(cond, w: LWindow)) =>
      val bound = cond match {
        case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) => Some(a -> k)
        case LessThan(a: Attribute, Literal(k: Int, _)) => Some(a -> (k - 1))
        case _ => None
      }
      bound match {
        case Some((rn, k)) if k >= 1 && asRowNumberWindow(w, rn) &&
            !projList.exists(_.references.exists(_.exprId == rn.exprId)) &&
            w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall(_.isInstanceOf[Attribute]) =>
          Project(projList.asInstanceOf[Seq[NamedExpression]],
            TopKPerKey(w.partitionSpec, w.orderSpec, k,
              stripGroupLimit(w.child)))
        case _ => p
      }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing construction + per-session strategy registration. */
object TopK {
  /** Idempotently register the planner strategy on this session —
    * `experimental.extraStrategies` is the runtime-injection twin of
    * `SparkSessionExtensions.injectPlannerStrategy` (which only applies
    * at session build time; the driver owns our sessions).
    */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }

  /** Also inject the automatic window-top-k rewrite (Rule[LogicalPlan])
    * — every later query on the session whose row_number ≤ k pattern
    * drops the rank column gets the heap operator for free.
    */
  def ensureRewriteRegistered(spark: SparkSession): Unit = synchronized {
    ensureRegistered(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
  }

  /** Top `k` rows per distinct value of `keys`, best-first under `order`
    * — (column name, ascending?) pairs that must form a TOTAL order
    * (include a tie-break column) or the boundary rows are
    * nondeterministic, same as any ranking query. Attributes are resolved
    * HERE against the analyzed child: Spark 4's Column is a lazy node
    * adapter that the analyzer only unwraps inside operators it knows,
    * and it reaches codegen unresolved inside a foreign node.
    */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    import org.apache.spark.sql.graftx.Bridge
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Expression = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name)}"))
    val sortOrders = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    Bridge.ofRows(spark, TopKPerKey(keys.map(attr), sortOrders, k, analyzed))
  }
}
