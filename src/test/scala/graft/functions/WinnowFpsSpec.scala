package graft.functions

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native one-pass winnow must be value-identical to the
  * declarative posexplode + per-doc window-min + distinct pipeline it
  * replaced in round 11 — the dedup_substring family's DuckDB oracle
  * replays that formulation, so any divergence breaks the hash gate.
  * The replay below IS the pre-round-11 pipeline, kept verbatim as the
  * independent reference. */
class WinnowFpsSpec extends SparkSuite {

  /** The old declarative winnow (posexplode + window), verbatim. */
  private def declarativeWinnow(documents: DataFrame): DataFrame = {
    val grams = documents
      .filter(length(col("text")) >= 47)
      .select(col("doc_id"), (length(col("text")) - 47).as("last_start"),
        posexplode(expr(
          "transform(sequence(1, greatest(length(text) - 31, 1)), " +
          "i -> substring(text, i, 32))")))
      .toDF("doc_id", "last_start", "pos", "g")
      .select(col("doc_id"), col("last_start"), col("pos"),
        Md5Prefix64.md5p64(col("g")).as("h"))
    val w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 15)
    grams
      .select(col("doc_id"), min(col("h")).over(w).as("minh"),
        col("pos"), col("last_start"))
      .filter(col("pos") <= col("last_start"))
      .select(col("doc_id"), col("minh").as("fp"))
      .distinct()
  }

  private def asSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("equals the declarative posexplode+window pipeline on the real corpus") {
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val native = asSet(docs
      .filter(length(col("text")) >= 47)
      .select(col("doc_id"), explode(WinnowFps.winnow(col("text"))).as("fp")))
    val reference = asSet(declarativeWinnow(docs))
    assert(native.nonEmpty, "corpus fixture yields no fingerprints — parity is vacuous")
    assert(native == reference,
      s"native-only: ${(native -- reference).take(5)}; " +
        s"window-only: ${(reference -- native).take(5)}")
  }

  test("equals the declarative pipeline on adversarial generated strings " +
      "(boundary lengths, repeats/ties, multibyte), through codegen") {
    import spark.implicits._
    val gen = Gen.frequency(
      4 -> Gen.choose(47, 300).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)), // hash ties
      3 -> Gen.choose(47, 300).flatMap(n =>
        Gen.listOfN(n, Gen.asciiPrintableChar).map(_.mkString)),
      2 -> Gen.choose(47, 120).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('x', 'é', '語', 'Ω')).map(_.mkString)),
      1 -> Gen.const("z" * 47)) // exactly one window
    val strs = (1 to 400).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(i.toLong))).distinct
    val docs = strs.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
      .repartition(8)
    val native = asSet(docs
      .filter(length(col("text")) >= 47)
      .select(col("doc_id"), explode(WinnowFps.winnow(col("text"))).as("fp")))
    val reference = asSet(declarativeWinnow(docs))
    assert(native == reference,
      s"native-only: ${(native -- reference).take(5)}; " +
        s"window-only: ${(reference -- native).take(5)}")
  }

  test("sub-guarantee texts fingerprint to nothing; 47 chars to exactly one") {
    import spark.implicits._
    val df = Seq((1L, "a" * 46), (2L, "b" * 47), (3L, ""), (4L, "short"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        size(WinnowFps.winnow(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 0))
  }

  test("the winnow plan has no Exchange before the fingerprint projection") {
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val plan = docs
      .filter(length(col("text")) >= 47)
      .select(col("doc_id"), explode(WinnowFps.winnow(col("text"))).as("fp"))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"fingerprinting should be shuffle-free, got:\n$plan")
    assert(!plan.toLowerCase.contains("window"),
      s"the per-doc window should be gone from the plan:\n$plan")
  }
}
