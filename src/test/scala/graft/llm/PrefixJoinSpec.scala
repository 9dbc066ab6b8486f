package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtered exact Jaccard (AllPairs/PPJoin) vs the inverted-
  * index path: the two must produce IDENTICAL pair sets for the same
  * (threshold, dfCap) — the prefix filter is a lossless candidate
  * pruning, not an approximation. The fixtures attack the two ways a
  * prefix bound goes wrong: α off by one at thresholds where t·nᵏ is
  * exactly integral (a float-ceil would round up and silently shorten
  * the prefix past the sound length), and cap interaction (prefixes
  * are taken over KEPT shingles while denominators stay full). */
class PrefixJoinSpec extends SparkSuite {

  import spark.implicits._

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def parity(grams: DataFrame, jNum: Int, jDen: Int, dfCap: Long): Unit = {
    val inv = pairsOf(Dedup.jaccardPairsFrom(grams, jNum.toDouble / jDen, dfCap))
    val pfx = pairsOf(Dedup.jaccardPairsPrefix(grams, jNum, jDen, dfCap))
    assert(pfx == inv,
      s"prefix/inverted mismatch at $jNum/$jDen cap=$dfCap: " +
      s"missing=${inv -- pfx} extra=${pfx -- inv}")
  }

  test("parity with the inverted index on the real corpus (gate settings)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val shingled = docs
      .select(col("doc_id"), TextNorm.toks.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat(w[i],' ',w[i+1],' ',w[i+2]))")).as("gram"))
      .distinct()
    parity(shingled, 3, 5, Dedup.JaccardDfCap)
    val inv = pairsOf(Dedup.jaccardPairs(docs, 0.6, Dedup.JaccardDfCap))
    assert(inv.nonEmpty, "corpus fixture produces no pairs — parity is vacuous")
  }

  test("threshold-boundary pairs: exactly-at-t found, just-below rejected, α exact at integral t·n") {
    // n1=n2=4, inter=3 → J = 3/(8-3) = 0.6 EXACTLY at t=3/5; with n=4,
    // α=⌈12/5⌉=3 and prefix length 2 — both docs must still collide.
    // n3/n4: inter=2 of 4 → J=1/3, must be rejected by verification
    // even though the prefix join emits the candidate.
    // Asymmetric sizes at exactly t: n5=9, n6=7, inter=6 →
    // J = 6/(9+7-6) = 0.6; α₅=⌈27/5⌉=6 (prefix 4), α₆=⌈21/5⌉=5
    // (prefix 3) — the shared grams must reach both prefixes.
    val rows = Seq.newBuilder[(Long, String)]
    for (g <- 1 to 3) { rows += 1L -> s"s$g"; rows += 2L -> s"s$g" }
    rows += 1L -> "p1"; rows += 2L -> "p2"
    for (g <- 1 to 2) { rows += 3L -> s"u$g"; rows += 4L -> s"u$g" }
    rows += 3L -> "q1"; rows += 3L -> "q2"; rows += 4L -> "q3"; rows += 4L -> "q4"
    for (g <- 1 to 6) { rows += 5L -> s"v$g"; rows += 6L -> s"v$g" }
    for (g <- 1 to 3) rows += 5L -> s"w$g"
    rows += 6L -> "x1"
    val grams = rows.result().toDF("doc_id", "gram")
    parity(grams, 3, 5, Long.MaxValue)
    val pfx = pairsOf(Dedup.jaccardPairsPrefix(grams, 3, 5, Long.MaxValue))
    assert(pfx == Set((1L, 2L, 0.6), (5L, 6L, 0.6)), s"boundary set wrong: $pfx")
  }

  test("df-cap interaction: prefixes over kept shingles, denominators full") {
    // CapFiringSpec's corpus: hot gram df=5 > cap=3 leaves the index;
    // (1,2) must survive at J = 3/(4+4-3) = 0.6 via its rare grams.
    val grams = Seq(
      1L -> "hot", 2L -> "hot", 3L -> "hot", 4L -> "hot", 5L -> "hot",
      1L -> "g1", 2L -> "g1", 1L -> "g2", 2L -> "g2", 1L -> "g3", 2L -> "g3",
      3L -> "x1", 4L -> "y1", 5L -> "z1",
    ).toDF("doc_id", "gram")
    parity(grams, 1, 2, 3L)
    val pfx = pairsOf(Dedup.jaccardPairsPrefix(grams, 1, 2, 3L))
    assert(pfx == Set((1L, 2L, 0.6)), s"capped prefix semantics wrong: $pfx")
  }

  test("randomized parity across thresholds and caps (seeded)") {
    val rnd = new scala.util.Random(42)
    // 60 docs over an 80-gram vocabulary with skewed df (gram k drawn
    // ∝ 1/(k+1)) — yields hot grams, threshold-straddling pairs, and
    // size spread 3..20
    val rows = for {
      doc <- 1 to 60
      n = 3 + rnd.nextInt(18)
      g <- Iterator.continually(
        math.min(79, math.floor(math.pow(80.0, rnd.nextDouble())).toInt - 1)
      ).take(n * 3).toSeq.distinct.take(n).map(k => s"g$k")
    } yield (doc.toLong, g)
    val grams = rows.toDF("doc_id", "gram").distinct()
    for ((num, den) <- Seq((3, 5), (1, 2), (4, 5), (9, 10));
         cap <- Seq(Long.MaxValue, 8L))
      parity(grams, num, den, cap)
  }

  test("the prefix index is genuinely smaller than the full posting list") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val shingled = docs
      .select(col("doc_id"), TextNorm.toks.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat(w[i],' ',w[i+1],' ',w[i+2]))")).as("gram"))
      .distinct()
    val full = shingled.count()
    val pfxPostings = shingled
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nk"))
      .select(sum(expr("nk - ((3 * nk + 4) div 5) + 1")))
      .head().getLong(0)
    assert(pfxPostings < full,
      s"prefix postings $pfxPostings not smaller than full $full")
  }
}
