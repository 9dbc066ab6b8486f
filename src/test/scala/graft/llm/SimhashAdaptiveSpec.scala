package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Proof that the ADAPTIVE SimHash banding ([[Dedup
  * .simhashPairsFromSigs]]) is safe to switch on past
  * [[Dedup.SimComboThreshold]] — the gate SFs all sit below 32768
  * docs, so without these fixtures the 20×30-bit block-combination
  * path would ship untested. Three layers:
  *
  *  1. signature-level EXACTNESS: on crafted 60-bit signatures with
  *     planted flips the two banding modes return IDENTICAL rows, the
  *     hamming-3 pair (whose flips straddle three different 15-bit
  *     bands AND three different 10-bit blocks) is found, and the
  *     hamming-4 pair is excluded;
  *  2. a brute-force sweep: 400 md5-pseudo-random signatures plus
  *     every ≤3-bit perturbation of 40 of them — BOTH modes must equal
  *     the O(n²) cross-join ground truth (recall-completeness in
  *     practice, not just by the pigeonhole argument);
  *  3. end-to-end over documents: a 33,100-doc corpus (> threshold,
  *     same scale as AdaptiveLshSpec) with 50 planted exact-duplicate
  *     pairs — the GATE path (which self-selects combo mode) equals a
  *     forced 4-band run and keeps all planted dups at hamming 0.
  */
class SimhashAdaptiveSpec extends SparkSuite {
  import spark.implicits._

  private def pairs(sig: org.apache.spark.sql.DataFrame, combos: Boolean) =
    Dedup.simhashPairsFromSigs(sig, combos)
      .select("id1", "id2", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("crafted flips: modes agree; hamming-3 found, hamming-4 excluded") {
    val base = 0x0ABCDEF123456789L & ((1L << 60) - 1)
    // flips in bands 0/1/3 and blocks 0/2/5 — no single band or block
    // absorbs them, so the match must come from a clean band / triple
    val ham3 = base ^ (1L << 2) ^ (1L << 21) ^ (1L << 57)
    val ham4 = base ^ (1L << 3) ^ (1L << 18) ^ (1L << 33) ^ (1L << 48)
    val sig = Seq((1L, base), (2L, ham3), (3L, ham4)).toDF("doc_id", "sim")
    val four = pairs(sig, combos = false)
    val comb = pairs(sig, combos = true)
    assert(four == comb, s"modes diverged: ${four.diff(comb)} / ${comb.diff(four)}")
    assert(comb.contains((1L, 2L, 3L)))
    assert(!comb.exists { case (a, b, _) => (a, b) == ((1L, 3L)) })
  }

  test("brute-force sweep: both modes equal the cross-join ground truth") {
    // 400 backgrounds; docs 1000+3k..1000+3k+2 are ≤3-bit perturbations
    // of background k (k < 40): k%4 tells how many bits to flip, at
    // md5-derived positions, so flips land in arbitrary bands/blocks
    val sig = spark.range(400).selectExpr(
        "id AS doc_id",
        "CAST(conv(substring(md5(concat('s|', CAST(id AS STRING))), 1, 15), 16, 10) AS BIGINT) & 1152921504606846975 AS sim")
      .unionByName(spark.range(40).selectExpr("id AS k")
        .selectExpr("k", "explode(sequence(0, 2)) AS j")
        .selectExpr("CAST(1000 + 3*k + j AS BIGINT) AS doc_id",
          // flip (k % 4) bits of background k at md5-chosen positions
          // (guarded f < k%4 — sequence(1, 0) would be DESCENDING)
          """aggregate(sequence(0, 3),
               CAST(conv(substring(md5(concat('s|', CAST(k AS STRING))), 1, 15), 16, 10) AS BIGINT) & 1152921504606846975,
               (acc, f) -> IF(f < k % 4,
                 CAST(acc ^ shiftleft(CAST(1 AS BIGINT), CAST(conv(substring(md5(concat('f|', CAST(k AS STRING), '|', CAST(j AS STRING), '|', CAST(f AS STRING))), 1, 4), 16, 10) AS INT) % 60) AS BIGINT),
                 acc)) AS sim"""))
      .persist()
    sig.count()
    val truth = sig.as("a").crossJoin(sig.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(truth.nonEmpty, "sweep fixture produced no hamming<=3 pairs")
    val four = pairs(sig, combos = false)
    val comb = pairs(sig, combos = true)
    assert(four == truth, s"4-band missed/extra: ${truth.diff(four).take(3)} / ${four.diff(truth).take(3)}")
    assert(comb == truth, s"combo missed/extra: ${truth.diff(comb).take(3)} / ${comb.diff(truth).take(3)}")
    sig.unpersist()
  }

  test("end-to-end past the threshold: gate self-selects combos, equals 4-band") {
    val d = java.nio.file.Files.createTempDirectory("simhash_adaptive").toString
    val n = 33000L
    // background docs: 6 doc-unique tokens each (signatures ~uniform);
    // planted pair k duplicates doc txt exactly at ids (B+2k, B+2k+1)
    val bg = spark.range(n).selectExpr(
      "id AS doc_id",
      "array_join(transform(sequence(0, 5), i -> concat('w', CAST(id AS STRING), 'x', CAST(i AS STRING))), ' ') AS text")
    val pl = spark.range(50).selectExpr("id AS k")
      .selectExpr("explode(sequence(0, 1)) AS j", "k")
      .selectExpr(s"CAST($n + 2*k + j AS BIGINT) AS doc_id",
        "array_join(transform(sequence(0, 5), i -> concat('d', CAST(k AS STRING), 'z', CAST(i AS STRING))), ' ') AS text")
    bg.unionByName(pl)
      .selectExpr("doc_id", "text", "'en' AS lang", "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(4).write.mode("overwrite").parquet(s"$d/documents.parquet")
    assert(n + 100 > Dedup.SimComboThreshold)
    val sig = Dedup.simhashSigs(spark, d).persist()
    sig.count()
    val gate = pairs(sig, combos = true)  // what the gate runs at this n
    val four = pairs(sig, combos = false)
    assert(gate == four,
      s"modes diverged at ${n + 100} docs: ${gate.diff(four).take(3)} / ${four.diff(gate).take(3)}")
    val planted = (0 until 50).map(k => (n + 2 * k, n + 2 * k + 1, 0L)).toSet
    assert(planted.subsetOf(gate), s"lost planted dups: ${(planted -- gate).take(3)}")
    sig.unpersist()
  }
}
