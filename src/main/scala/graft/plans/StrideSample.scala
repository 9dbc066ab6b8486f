package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.SqlShim

/** kmr_map_skipping / kmr_sample_kv (src/kmrbase.c:1191-1330,
  * src/kmrmoreops.c:309-327) as a WHOLE-OPERATOR Catalyst extension —
  * the brief's ladder step (c): logical node + planner strategy +
  * physical node. A global "every stride-th element of the global order
  * starting at from" cannot be a scalar expression (it needs the
  * cross-partition index), and composing it from zipWithIndex at the
  * Dataset level hides it from the optimizer; as a plan node it stays
  * visible, prunable, and AQE-compatible.
  *
  * The physical node is the two-phase KMR design: a count pass per
  * partition, driver-side exclusive offsets (O(P)), then one streaming
  * pass emitting matching rows — no buffering, rows pass through
  * untouched.
  */
case class StrideSample(from: Long, stride: Long, child: LogicalPlan)
    extends UnaryNode {
  require(stride > 0 && from >= 0, s"bad stride sample ($from, $stride)")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): StrideSample =
    copy(child = c)
}

case class StrideSampleExec(from: Long, stride: Long, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputOrdering = child.outputOrdering
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // The two passes must see the SAME rows in the SAME order: cache the
    // child output (copying — UnsafeRow iterators reuse buffers) so the
    // count pass doesn't trigger a full re-execution, which would also
    // break the stride for nondeterministic children. Blocks are freed
    // by the ContextCleaner when the RDD is unreferenced.
    val rdd = child.execute().map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val offB = sparkContext.broadcast(offsets)
    val (f, s) = (from, stride)
    rdd.mapPartitionsWithIndex({ (i, it) =>
      var idx = offB.value(i)
      it.filter { _ =>
        val keep = idx >= f && (idx - f) % s == 0
        idx += 1
        keep
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): StrideSampleExec =
    copy(child = c)
}

/** Optimizer rule (the 4th Catalyst extension point, after the native
  * Expression, the TypedImperativeAggregates and the plan-node/strategy
  * pair): StrideSample selects rows by GLOBAL POSITION, and a Project
  * never changes row positions — so `StrideSample(Project(c))` can
  * become `Project(StrideSample(c))` when the projection is
  * deterministic. The projection's COMPUTED expressions (md5, regex,
  * variant parses…) then run only on the 1-in-stride kept rows instead
  * of every row. Two deliberate limits:
  * - attribute-only (pruning) projections are NOT lifted — they compute
  *   nothing, and lifting one would widen the sampler's two-pass
  *   persist back to the full source row (text and all), trading zero
  *   expression savings for a large caching cost;
  * - when a computed projection IS lifted, a pruning projection over
  *   its referenced attributes is left below the sampler, so the
  *   persist still holds only the columns the expressions need.
  * Nondeterministic projections are left in place: relocating them
  * would change how many times they evaluate. Catalyst's own pushdown
  * rules skip unknown nodes, which is exactly why the custom operator
  * must bring its own rule. */
object PushProjectBelowStrideSample extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case StrideSample(f, s, Project(projList, child))
        if projList.forall(_.deterministic) &&
          projList.exists(e =>
            !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference]) =>
      val needed = org.apache.spark.sql.catalyst.expressions.AttributeSet(
        projList.flatMap(_.references))
      val pruned =
        if (needed.size < child.output.size)
          Project(child.output.filter(needed.contains), child)
        else child
      Project(projList, StrideSample(f, s, pruned))
  }
}

object StrideSampleStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case StrideSample(f, s, child) =>
      StrideSampleExec(f, s, planLater(child)) :: Nil
    case _ => Nil
  }
}

object StrideSample {
  /** Apply the operator to a DataFrame, registering the strategy on the
    * session if needed (idempotent — also injectable via
    * GraftExtensions for extension-built sessions). */
  def sample(df: DataFrame, from: Long, stride: Long): DataFrame = {
    val spark = df.sparkSession
    // registration must be race-free: Verify runs queries concurrently
    spark.synchronized {
      if (!spark.experimental.extraStrategies.contains(StrideSampleStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ StrideSampleStrategy
      if (!spark.experimental.extraOptimizations.contains(PushProjectBelowStrideSample))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ PushProjectBelowStrideSample
    }
    SqlShim.ofRows(spark, StrideSample(from, stride, SqlShim.logicalPlan(df)))
  }
}
