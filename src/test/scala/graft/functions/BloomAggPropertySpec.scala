package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated properties for the Bloom aggregate over
  * arbitrary key sets (negatives, extremes, duplicates) and arbitrary
  * partitionings (fixed seeds, reproducible): the no-false-negative
  * guarantee must hold for EVERY input and EVERY parallel merge order —
  * the property that makes the semi-join reduction sound — and an empty
  * build side must reject every probe (definitely-absent, so the
  * prefilter of an empty-dim join is the empty scan, not a full pass).
  */
class BloomAggPropertySpec extends SparkSuite {

  private val Bits = 4096
  private val K = 3

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val keysGen: Gen[List[Long]] =
    Gen.listOfN(120, Gen.frequency(
      6 -> Gen.choose(Long.MinValue, Long.MaxValue),
      2 -> Gen.choose(-1000L, 1000L),            // duplicates likely
      1 -> Gen.oneOf(0L, -1L, Long.MinValue, Long.MaxValue)))

  test("no false negatives for arbitrary keys across arbitrary partition counts") {
    import spark.implicits._
    samples(Gen.zip(keysGen, Gen.choose(1, 7)), 8).foreach { case (keys, parts) =>
      val bloom = keys.toDF("k").repartition(parts)
        .agg(BloomAgg.bloomAgg(col("k"), Bits, K).as("bf"))
      val misses = keys.distinct.toDF("k")
        .join(broadcast(bloom))
        .filter(!BloomAgg.mightContain("bf", "k", Bits, K))
        .count()
      assert(misses == 0,
        s"$misses false negatives [n=${keys.size}, parts=$parts]")
    }
  }

  test("an empty build side rejects every probe") {
    import spark.implicits._
    val bloom = Seq.empty[Long].toDF("k")
      .agg(BloomAgg.bloomAgg(col("k"), Bits, K).as("bf"))
    assert(bloom.count() == 1, "global aggregate over empty input must still emit one row")
    val hits = (1L to 1000L).toDF("k")
      .join(broadcast(bloom))
      .filter(BloomAgg.mightContain("bf", "k", Bits, K))
      .count()
    assert(hits == 0, s"empty bloom accepted $hits keys")
  }

  test("null keys are ignored, not inserted") {
    import spark.implicits._
    val bloom = Seq(Some(7L), None, None).toDF("k")
      .agg(BloomAgg.bloomAgg(col("k"), Bits, K).as("bf"))
    val arr = bloom.collect()(0).getSeq[Long](0)
    val pop = arr.map(java.lang.Long.bitCount).sum
    assert(pop <= K, s"nulls contributed bits: popcount $pop > $K")
  }
}
