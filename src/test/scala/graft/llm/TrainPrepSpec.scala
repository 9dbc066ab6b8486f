package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Invariants of the training-prep operators (the gate checks exact
  * values vs DuckDB; these pin the structural properties that must
  * survive any refactor of the underlying plans). */
class TrainPrepSpec extends SparkSuite {

  private def q(name: String) = TrainPrep.defs.find(_.name == name).get.fn(spark, sfDir)

  test("seq_pack conserves documents and tokens and starts at pack 0") {
    val packs = q("seq_pack").collect()
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()
    val totToks = docs
      .select(when(col("text").isNull || trim(regexp_replace(lower(col("text")), "\\s+", " ")) === "", 0L)
        .otherwise(size(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).cast("long")).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(packs.map(_.getLong(1)).sum == nDocs, "every doc lands in exactly one pack")
    assert(packs.map(_.getLong(2)).sum == totToks, "token mass is conserved")
    assert(packs.map(_.getLong(0)).min == 0L)
    val ids = packs.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted && ids.distinct == ids, "pack ids ascend without repeats")
  }

  test("split_assign partitions the corpus 80/10/10-ish and is deterministic") {
    val a = q("split_assign").collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = q("split_assign").collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a == b, "split must be run-to-run deterministic")
    val n = graft.Tables.load(spark, sfDir, "documents").count()
    assert(a.values.sum == n, "every doc gets exactly one split")
    val train = a.collect { case ((s, _), c) if s == "train" => c }.sum.toDouble / n
    assert(train > 0.65 && train < 0.95, s"train fraction $train implausible for an 80% target")
    assert(a.keys.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("rep_tokens fractions are well-formed") {
    val rows = q("rep_tokens").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, nu, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nu >= 1 && nu <= nt, s"distinct count $nu out of [1, $nt]")
      assert(f >= 0.0 && f < 1.0, s"dup_frac $f out of [0,1)")
    }
  }
}
