package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** End-to-end proof that the ADAPTIVE SRP band width ([[AnnOps
  * .bandBitsFor]]) actually fires and stays correct past the widening
  * threshold — the gate SFs all sit below 32768 vectors, so without
  * this fixture the >8-bit path would ship attested only by the
  * formula pin in BitWidthSpec. The corpus is 33,100 vectors
  * (> LshOcc·2⁸): 33k md5-derived pseudo-random background vectors
  * plus 50 planted near-identical pairs. Asserts:
  *
  *  - the width genuinely widened (9 bits at this n);
  *  - the inline broadcast twin and the score-in-bucket indexed twin
  *    produce IDENTICAL pair sets (they share one DuckDB oracle, so
  *    twin equality at a width the gates never reach is the cheap
  *    in-JVM proxy for oracle parity — the 40k-vector fixture replay
  *    in ROUND13_NOTES carries the actual DuckDB attestation);
  *  - every planted near-dup pair survives the widening (recall at
  *    cos ≈ 1 stays ~1: p_band ≈ 0.997⁹, 8 bands). */
class AdaptiveLshSpec extends SparkSuite {

  private val Background = 33000L
  private val Planted = 50

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("adaptive_lsh").toString
    // background: component i of vector v = md5('v|'||v||'|'||i) in
    // [-1000, 1000] — independent directions, cos concentrated near 0
    val bg = spark.range(Background).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 63), i -> CAST(CAST(conv(substring(md5(concat('v|', CAST(id AS STRING), '|', CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2001 - 1000 AS FLOAT)) AS embedding",
      "CAST(id % 7 AS INT) AS label")
    // planted: pair k = ids (B+2k, B+2k+1); the twin differs by +1 on
    // component 0 only, so cosine ≈ 1 ≫ 0.4
    val pl = spark.range(Planted).selectExpr(
      s"CAST($Background + 2*id AS BIGINT) AS base_id", "id AS k")
      .selectExpr("base_id", "k",
        "transform(sequence(0, 63), i -> CAST(CAST(conv(substring(md5(concat('p|', CAST(k AS STRING), '|', CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2001 - 1000 AS FLOAT)) AS e")
      .selectExpr(
        "array(struct(base_id AS vec_id, e AS embedding), " +
        "struct(base_id + 1 AS vec_id, transform(e, (x, i) -> CAST(CASE WHEN i = 0 THEN x + 1 ELSE x END AS FLOAT)) AS embedding)) AS pairarr")
      .selectExpr("inline(pairarr)")
      .selectExpr("vec_id", "embedding", "CAST(0 AS INT) AS label")
    bg.unionByName(pl)
      .coalesce(4).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("band width widens past 32768 vectors on this fixture") {
    assert(AnnOps.bandBitsFor(Background + 2L * Planted) == 9)
  }

  test("inline and indexed twins agree at the widened width; planted pairs survive") {
    val inline = graft.SparkEntry.queries("dedup_embedding_lsh")(spark, dir)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexed = graft.SparkEntry.queries("dedup_embedding_lsh_indexed")(spark, dir)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inline == indexed,
      s"twins diverged at 9-bit bands: only-inline=${(inline -- indexed).take(5)} " +
        s"only-indexed=${(indexed -- inline).take(5)}")
    val planted = (0 until Planted).map { k =>
      (Background + 2L * k, Background + 2L * k + 1)
    }.toSet
    val missed = planted -- inline
    assert(missed.isEmpty, s"widening lost planted near-dups: ${missed.take(5)}")
  }
}
