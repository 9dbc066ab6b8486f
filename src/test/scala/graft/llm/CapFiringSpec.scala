package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The 100 TB guard rails with the caps actually FIRING (round-9
  * verdict item 5): every df/block cap is provably dormant at the test
  * SFs (max observed df/block sizes sit far under the caps), which
  * means the CAPPED semantics had never been checked against an
  * independent expectation. These fixtures are built so each cap
  * fires, and the expected outputs are derived BY HAND from the
  * documented semantics — numerator capped, denominator full for
  * Jaccard/containment; whole block dropped for fuzzy — so a silent
  * change in what the guard keeps or drops fails loudly. The DuckDB
  * gate oracles replay the same HAVING guards, so gate parity follows
  * from these semantics being exact. */
class CapFiringSpec extends SparkSuite {

  import spark.implicits._

  // docs 1..5 share the hot gram (df=5); docs 1,2 additionally share
  // three rare grams; docs 3,4,5 have one private gram each
  private lazy val grams = Seq(
    1L -> "hot", 2L -> "hot", 3L -> "hot", 4L -> "hot", 5L -> "hot",
    1L -> "g1", 2L -> "g1", 1L -> "g2", 2L -> "g2", 1L -> "g3", 2L -> "g3",
    3L -> "x1", 4L -> "y1", 5L -> "z1",
  ).toDF("doc_id", "gram")

  test("jaccard df-cap fires: numerator drops hot grams, denominator keeps full sizes") {
    // cap=3 < df(hot)=5 → hot leaves the index. Pair (1,2): inter=3 of
    // the rare grams, sizes stay the FULL 4 → J = 3/(4+4-3) = 0.6
    // exactly. Pairs that existed only through the hot gram disappear.
    val capped = Dedup.jaccardPairsFrom(grams, minJ = 0.5, dfCap = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == Set((1L, 2L, 0.6)),
      s"capped semantics must be numerator-capped/denominator-full: $capped")

    // and the cap genuinely FIRED: the uncapped run disagrees (hot gram
    // makes (1,2) identical and creates hot-only pairs at J=0.5)
    val uncapped = Dedup.jaccardPairsFrom(grams, minJ = 0.5, dfCap = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(uncapped == Set((1L, 2L, 1.0), (3L, 5L, 0.5), (4L, 5L, 0.5), (3L, 4L, 0.5))
      || uncapped.contains((1L, 2L, 1.0)), s"fixture no longer adversarial: $uncapped")
    assert(capped != uncapped, "cap did not fire — fixture is dead")
  }

  test("containment df-cap fires with the same numerator/denominator split") {
    // (1,2): inter=3 capped, min(n1,n2)=4 full → 1000*3 div 4 = 750
    val capped = Dedup.containmentPairsFrom(grams, minMilli = 500L, dfCap = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(capped == Set((1L, 2L, 4L, 4L, 750L)),
      s"capped containment must be (1,2,n1=4,n2=4,750): $capped")
    val uncapped = Dedup.containmentPairsFrom(grams, minMilli = 500L, dfCap = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(capped.map(t => (t._1, t._2, t._5)) != uncapped, "cap did not fire")
  }

  test("winnow fingerprint df-cap fires: hot fingerprint leaves the self-join") {
    // fp H hits 4 docs (df=4 > cap=3); two rare fps tie docs 1,2
    val fps = Seq(
      1L -> 100L, 2L -> 100L, 3L -> 100L, 4L -> 100L, // hot fp
      1L -> 201L, 2L -> 201L, 1L -> 202L, 2L -> 202L, // rare fps
    ).toDF("doc_id", "fp")
    val capped = Dedup.substringPairsFrom(fps, dfCap = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == Set((1L, 2L, 2L)),
      s"capped pairs must count only rare shared fps: $capped")
    val uncapped = Dedup.substringPairsFrom(fps, dfCap = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(uncapped.size == 6 && uncapped.contains((1L, 2L, 3L)),
      s"fixture no longer adversarial: $uncapped")
  }

  test("semdedup cell cap fires: an over-cap cell is dropped WHOLE, " +
      "small cells still pair") {
    // cell 1 holds cap+1 identical unit vectors — every pair is an exact
    // dup, yet the capped run must drop the whole cell (the documented
    // block-dropped-whole semantics); cell 2's two identical vectors
    // still pair: ccos tie → evict the higher id.
    val cap = 3L
    val assigned = Seq(
      (10L, Seq(1.0, 0.0), 1L), (11L, Seq(1.0, 0.0), 1L),
      (12L, Seq(1.0, 0.0), 1L), (13L, Seq(1.0, 0.0), 1L),
      (20L, Seq(0.0, 1.0), 2L), (21L, Seq(0.0, 1.0), 2L))
      .toDF("vec_id", "e", "cid").withColumn("nrm", lit(1.0))
      .select("vec_id", "e", "nrm", "cid")
    val cents = Seq((1L, Seq(1.0, 0.0), 1.0), (2L, Seq(0.0, 1.0), 1.0))
      .toDF("cid", "ce", "cnrm")
    val capped = AnnOps.semDedupOn(assigned, cents, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(capped == Seq((2L, 21L, 1L, 1000000L)),
      s"capped semdedup must keep only cell 2's pair: $capped")
    val uncapped = AnnOps.semDedupOn(assigned, cents, Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(uncapped == Set(
      (1L, 11L, 1L, 1000000L), (1L, 12L, 2L, 1000000L), (1L, 13L, 3L, 1000000L),
      (2L, 21L, 1L, 1000000L)),
      s"fixture no longer adversarial (cap would be vacuous): $uncapped")
  }

  test("embedding label-block cap fires: an over-cap label is dropped " +
      "WHOLE, small labels still pair") {
    // label 1 holds cap+1 identical unit vectors — every pair is an
    // exact dup (cos=1), yet the capped run must drop the whole block
    // (the documented block-dropped-whole semantics, same as semdedup's
    // cell cap); label 2's two identical vectors still pair.
    val cap = 3L
    val v = Seq(
      (10L, Seq(1.0, 0.0), 1L), (11L, Seq(1.0, 0.0), 1L),
      (12L, Seq(1.0, 0.0), 1L), (13L, Seq(1.0, 0.0), 1L),
      (20L, Seq(0.0, 1.0), 2L), (21L, Seq(0.0, 1.0), 2L))
      .toDF("vec_id", "e", "label").withColumn("nrm", lit(1.0))
      .select("vec_id", "e", "nrm", "label")
    val capped = AnnOps.embeddingPairsOn(v, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(capped == Seq((2L, 20L, 21L, 1.0)),
      s"capped run must keep only label 2's pair: $capped")
    val uncapped = AnnOps.embeddingPairsOn(v, Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(uncapped == Set(
      (1L, 10L, 11L, 1.0), (1L, 10L, 12L, 1.0), (1L, 10L, 13L, 1.0),
      (1L, 11L, 12L, 1.0), (1L, 11L, 13L, 1.0), (1L, 12L, 13L, 1.0),
      (2L, 20L, 21L, 1.0)),
      s"fixture no longer adversarial (cap would be vacuous): $uncapped")
  }

  test("SRP-LSH bucket cap fires: a planted hot direction drops its " +
      "buckets WHOLE, cold buckets still pair") {
    // Planted hot direction: cap+2 IDENTICAL unit vectors along e₀ —
    // identical sign pattern in every band, so all 8 of their buckets
    // exceed the cap and the capped run must yield ZERO candidates
    // from them (dropped whole, exactly like EmbBlockCap/SemCellCap),
    // even though every pair is an exact dup. Two identical vectors
    // along a DIFFERENT direction occupy cold buckets (occupancy 2)
    // and must still pair. This is the anisotropic-corpus failure mode
    // the round-13 verdict flagged: bandBitsFor bounds the MEAN
    // occupancy, only this cap bounds the TAIL.
    val cap = 4L
    val dim = 64
    def unit(axis: Int): Seq[Double] =
      Seq.tabulate(dim)(i => if (i == axis) 1.0 else 0.0)
    val hot = (0 until (cap + 2).toInt).map(i => (100L + i, unit(0)))
    val cold = Seq((900L, unit(7)), (901L, unit(7)))
    val v = (hot ++ cold).toDF("vec_id", "e").withColumn("nrm", lit(1.0))

    val capped = AnnOps.lshCandidates(spark, v, nb = 8, bucketCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((900L, 901L)),
      s"capped run must keep only the cold bucket's pair: $capped")

    val uncapped = AnnOps.lshCandidates(spark, v, nb = 8, bucketCap = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == (cap + 2) * (cap + 1) / 2 + 1,
      s"fixture no longer adversarial (hot pairs absent uncapped): $uncapped")
    assert(capped != uncapped, "cap did not fire — fixture is dead")

    // the n ≤ cap FAST PATH (census provably vacuous — a band holds
    // only n rows) must be row-identical to the census path
    val n = (cap + 2) + 2
    val viaSkip = AnnOps.lshCandidates(spark, v, nb = 8, bucketCap = n + 1, n = n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaCensus = AnnOps.lshCandidates(spark, v, nb = 8, bucketCap = n + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSkip == viaCensus && viaSkip == uncapped,
      s"fast path must equal the census path when no bucket can exceed " +
        s"the cap: skip=$viaSkip census=$viaCensus")
  }

  test("the PERSISTED hot list drops a planted hot direction from the " +
      "indexed twin (cap fires through ServedIndex, twins agree)") {
    // The r15 serve path: dedup_embedding_lsh_indexed anti-joins the
    // persisted lshHot stop list instead of running the occupancy
    // census per query. Plant LshBucketCap+2 identical vectors — the
    // built hot table must cover all 8 bands, and the indexed twin
    // must agree with the inline (census-path) twin with the hot
    // direction's pairs GONE and the cold pair kept.
    val cap = AnnOps.LshBucketCap
    val dim = 64
    def unitF(axis: Int): Seq[Float] =
      Seq.tabulate(dim)(i => if (i == axis) 1.0f else 0.0f)
    val hotV = (0 until (cap + 2).toInt).map(i => (100000L + i, unitF(0)))
    val cold = Seq((900L, unitF(7)), (901L, unitF(7)))
    val dir = java.nio.file.Files.createTempDirectory("cap_lsh_served").toString
    (hotV ++ cold).toDF("vec_id", "embedding")
      .repartition(8).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val hot = AnnOps.lshHot(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hot.map(_._1).toSet == (0L until 8L).toSet,
      s"hot list must cover all 8 bands of the planted direction: ${hot.toSeq}")

    val indexed = graft.SparkEntry.queries("dedup_embedding_lsh_indexed")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = graft.SparkEntry.queries("dedup_embedding_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(indexed == inline,
      s"served-hot twin diverged from the census twin: " +
        s"extra=${(indexed -- inline).take(3)} missing=${(inline -- indexed).take(3)}")
    assert(indexed == Set((900L, 901L)),
      s"hot direction must be dropped whole, cold pair kept: $indexed")
  }

  test("fuzzy block cap fires: a stop-token block is dropped whole, " +
      "discriminative blocks still pair") {
    // FuzzyBlockCap+1 docs share first token "the" — uncapped this
    // block alone is >10000² ≈ 10⁸ levenshtein calls (the 100 TB
    // quadratic the guard exists for); capped it vanishes, including
    // the two IDENTICAL docs planted inside it. The small "zebra"
    // block stays and pairs its two near-identical prefixes.
    val cap = TextOps.FuzzyBlockCap.toInt
    val hot = (0 until cap + 1).map(i => (i.toLong, s"the filler number $i"))
    val planted = Seq(
      (900001L, "the same same same"), (900002L, "the same same same"),
      (910001L, "zebra alpha alpha alpha"),
      (910002L, "zebra alpha alpha alphb"),
      (910003L, "zebra a completely different very long tail text"))
    val dir = java.nio.file.Files.createTempDirectory("cap_fuzzy").toString
    (hot ++ planted).toDF("doc_id", "text")
      .repartition(8).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("fuzzy_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // prefix("zebra alpha alpha alpha") vs "...alphb": distance 1;
    // the third zebra doc is > 8 edits away on the 32-char prefix
    assert(out == Set((910001L, 910002L, 1L)),
      s"only the discriminative block may pair (and the planted identical " +
        s"docs in the hot block must be dropped): $out")
  }
}
