package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.functions._

/** PushProjectBelowStrideSample: the optimizer rule must relocate
  * deterministic projections below the sampler (their expressions then
  * run on 1-in-stride rows only), must NOT touch nondeterministic ones,
  * and must never change results — position-based sampling commutes
  * with Project because a projection never changes row positions. */
class StrideRuleSpec extends SparkSuite {

  private def docs = graft.Tables.load(spark, sfDir, "documents")

  test("computed projection lifts above the sampler; only a pruning projection stays below") {
    val sampled = StrideSample.sample(
      docs.select(md5(col("text")).as("h"), col("doc_id")), from = 2, stride = 10)
    val opt = sampled.queryExecution.optimizedPlan
    val nodes = opt.collect { case ss: StrideSample => ss }
    assert(nodes.size == 1, s"expected one StrideSample node:\n$opt")
    // the md5 must be gone from below the sampler; what remains below is
    // at most an attribute-only pruning projection over its references
    nodes.head.child match {
      case Project(projList, _) =>
        assert(projList.forall(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.AttributeReference]),
          s"computed expression still below the sampler:\n$opt")
        assert(projList.map(_.name).toSet == Set("doc_id", "text"),
          s"pruning projection keeps the wrong columns:\n$opt")
      case _ => // bare relation is fine too
    }
    assert(opt.isInstanceOf[Project], s"computed projection must sit on top:\n$opt")
    assert(opt.asInstanceOf[Project].projectList.exists(_.name == "h"))
  }

  test("attribute-only pruning projection is NOT lifted (it narrows the persist)") {
    val sampled = StrideSample.sample(
      docs.select(col("doc_id"), col("n_chars")), from = 2, stride = 10)
    val opt = sampled.queryExecution.optimizedPlan
    val nodes = opt.collect { case ss: StrideSample => ss }
    assert(nodes.size == 1)
    // the 2-column pruning projection must remain below the sampler so
    // the two-pass persist holds two longs, not the full document row
    nodes.head.child match {
      case Project(projList, _) =>
        assert(projList.map(_.name).toSet == Set("doc_id", "n_chars"),
          s"pruning projection disturbed:\n$opt")
      case other =>
        assert(other.output.map(_.name).toSet == Set("doc_id", "n_chars"),
          s"sampler child reads more than the projection:\n$opt")
    }
  }

  test("pushdown preserves results exactly (sample-then-project equality)") {
    val viaRule = StrideSample.sample(
      docs.select(md5(col("text")).as("h"), col("doc_id")), from = 2, stride = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    val reference = StrideSample.sample(docs, from = 2, stride = 10)
      .select(md5(col("text")).as("h"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(viaRule.nonEmpty && viaRule.toSeq == reference.toSeq)
  }

  test("nondeterministic projection is NOT relocated") {
    val sampled = StrideSample.sample(
      docs.select(col("doc_id"), rand(42).as("r")), from = 0, stride = 7)
    val opt = sampled.queryExecution.optimizedPlan
    val nodes = opt.collect { case ss: StrideSample => ss }
    assert(nodes.size == 1)
    assert(nodes.head.child.isInstanceOf[Project],
      s"nondeterministic projection must stay below the sampler:\n$opt")
  }
}
