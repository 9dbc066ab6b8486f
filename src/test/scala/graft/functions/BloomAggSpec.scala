package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The Bloom filter's two contracts, pinned adversarially:
  * (1) NO FALSE NEGATIVES — every inserted key must probe true under the
  *     built-in-expression probe, for every partitioning (exercises the
  *     bitwise-OR merge path); a single build/probe hash disagreement
  *     would break this for almost every key, so the test doubles as the
  *     xxhash64-fold contract check.
  * (2) BOUNDED FALSE POSITIVES — at m=4096, k=3, n=500 the theoretical
  *     FPR is (1−e^{−kn/m})^k ≈ 2.9%; disjoint probes must stay under a
  *     2.5× margin of that. Deterministic keys → a stable number, not a
  *     flaky sample.
  */
class BloomAggSpec extends SparkSuite {

  private val Bits = 4096
  private val K = 3

  private def bloomOf(keys: Seq[Long], parts: Int) = {
    import spark.implicits._
    keys.toDF("k").repartition(parts)
      .agg(BloomAgg.bloomAgg(col("k"), Bits, K).as("bf"))
  }

  test("no false negatives across partition counts (merge = bitwise OR)") {
    import spark.implicits._
    val keys = (1L to 500L).map(i => i * 7919L)
    Seq(1, 3, 8).foreach { parts =>
      val bloom = bloomOf(keys, parts)
      val misses = keys.toDF("k")
        .join(broadcast(bloom))
        .filter(!BloomAgg.mightContain("bf", "k", Bits, K))
        .count()
      assert(misses == 0, s"$misses false negatives at parts=$parts")
    }
  }

  test("false-positive rate stays near the theoretical bound") {
    import spark.implicits._
    val keys = (1L to 500L).map(i => i * 7919L)
    val bloom = bloomOf(keys, 4)
    // disjoint probe set (offset breaks any multiple-of-7919 overlap)
    val probes = (1L to 20000L).map(i => i * 7919L + 13L)
    val fp = probes.toDF("k")
      .join(broadcast(bloom))
      .filter(BloomAgg.mightContain("bf", "k", Bits, K))
      .count()
    val rate = fp.toDouble / probes.size
    assert(rate < 0.075, s"FPR $rate exceeds 2.5x the ~2.9% theoretical bound")
  }

  test("single key sets at most K bits, at the positions the SQL probe computes") {
    import spark.implicits._
    val arr = Seq(42L).toDF("k")
      .agg(BloomAgg.bloomAgg(col("k"), Bits, K).as("bf"))
      .collect()(0).getSeq[Long](0)
    val popcount = arr.map(java.lang.Long.bitCount).sum
    assert(popcount <= K && popcount > 0, s"popcount $popcount not in (0, $K]")
    val positions = spark.sql(
      (0 until K).map(i => s"pmod(xxhash64(42L, $i), $Bits)").mkString("SELECT array(", ",", ") AS p"))
      .collect()(0).getSeq[Long](0)
    positions.foreach { pos =>
      val bit = (arr(pos.toInt / 64) >>> (pos.toInt % 64)) & 1L
      assert(bit == 1L, s"bit $pos (from the built-in xxhash64 fold) not set")
    }
  }

  test("degenerate parameters are rejected loudly") {
    intercept[IllegalArgumentException] {
      BloomAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L), 100, 3)
    }
    intercept[IllegalArgumentException] {
      BloomAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L), 4096, 0)
    }
  }
}
