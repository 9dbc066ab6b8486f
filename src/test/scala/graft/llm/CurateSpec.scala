package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Invariants of the curation operators (the gate checks exact values vs
  * DuckDB; these pin semantic properties a refactor must preserve). */
class CurateSpec extends SparkSuite {

  private def q(name: String) =
    graft.SparkEntry.defs.find(_.name == name).get.fn(spark, sfDir)

  test("pii_redact counts match the injection rule and scrubs every match") {
    val rows = q("pii_redact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, n) = (r.getLong(0), r.getLong(1))
      val expected = id % 3 match { case 0 => 1L; case 1 => 2L; case _ => 0L }
      assert(n == expected, s"doc $id: $n redactions, injection rule says $expected")
    }
    // independently re-scrub and confirm no email-shaped span survives
    val survivors = graft.Tables.load(spark, sfDir, "documents")
      .select(regexp_replace(
        concat(col("text"), lit(" x"), col("doc_id").cast("string"), lit("@y.com")),
        "[a-z0-9]+@[a-z0-9.]+", "<EMAIL>").as("clean"))
      .filter(col("clean").rlike("[a-z0-9]+@[a-z0-9.]+"))
      .count()
    assert(survivors == 0, "redaction left a matchable span behind")
  }

  test("contamination flags only train docs, with positive overlap") {
    val flagged = q("contamination").collect()
    assert(flagged.nonEmpty, "testdata plants cross-split dups; none found")
    assert(flagged.forall(_.getLong(1) > 0))
    val splits = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TrainPrep.splitCol.as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    flagged.foreach { r =>
      assert(splits(r.getLong(0)) == "train",
        s"doc ${r.getLong(0)} flagged but is in split ${splits(r.getLong(0))}")
    }
  }

  test("dedup_incremental counts nest and exclude the corpus source") {
    val rows = q("dedup_incremental").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, nDocs, nNew, nUniq) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(src != "src0", "the corpus shard must not appear as a delta")
      assert(nNew <= nDocs && nUniq <= nNew,
        s"$src: expected n_uniq_new <= n_new <= n_docs, got $nUniq/$nNew/$nDocs")
    }
    val allSources = graft.Tables.load(spark, sfDir, "documents")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet == allSources - "src0",
      "every non-corpus shard must be reported")
  }

  test("dedup_keep_best keeps the longest member (ties to smallest id) of each cluster") {
    val kept = q("dedup_keep_best").collect()
    assert(kept.nonEmpty, "testdata plants near-dups; no clusters found")
    val pairs = Dedup.minhashPairs(spark, sfDir, est = 0.5)
    val comps = Dedup.connectedComponents(pairs.select("id1", "id2"), iters = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val toks = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TrainPrep.nToks.as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val members = comps.groupBy(_._2).map { case (c, m) => c -> m.map(_._1).toSet }
    kept.foreach { r =>
      val (comp, keepId, size, keptToks) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val mem = members(comp)
      assert(mem.size == size, s"cluster $comp size $size != ${mem.size}")
      assert(mem.contains(keepId), s"keeper $keepId not a member of cluster $comp")
      val maxToks = mem.map(toks).max
      assert(keptToks == maxToks && toks(keepId) == maxToks,
        s"cluster $comp keeper $keepId has ${toks(keepId)} toks, max is $maxToks")
      assert(keepId == mem.filter(toks(_) == maxToks).min,
        s"cluster $comp: ties must break to the smallest doc_id")
    }
  }

  test("chunk_docs covers every token with stride-24 windows of at most 32") {
    val chunks = q("chunk_docs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = chunks.groupBy(_._1)
    val nToks = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TrainPrep.nToks.as("n")).filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet == nToks.keySet, "exactly the non-empty docs get chunks")
    byDoc.foreach { case (id, cs) =>
      val n = nToks(id)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until cs.length).toSeq, s"doc $id chunk_idx gap")
      sorted.foreach { case (_, idx, start, len) =>
        assert(start == idx * 24, s"doc $id chunk $idx start $start != stride*idx")
        assert(len == math.min(32L, n - start), s"doc $id chunk $idx bad length $len")
      }
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen == n, s"doc $id: chunks end at ${lastStart + lastLen}, not $n")
      assert(lastStart < n, s"doc $id emitted a chunk past the end")
    }
  }

  test("filter_funnel conserves documents: drops plus kept equal the corpus, per source") {
    val rows = q("filter_funnel").collect()
    assert(rows.nonEmpty)
    val bySource = graft.Tables.load(spark, sfDir, "documents")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == bySource.keySet, "every source reported")
    rows.foreach { r =>
      val (src, n, d1, d2, d3, d4, kept, keptToks) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(n == bySource(src), s"$src doc count drifted")
      assert(d1 + d2 + d3 + d4 + kept == n,
        s"$src funnel leaks: $d1+$d2+$d3+$d4+$kept != $n")
      assert(kept > 0, s"$src kept nothing — thresholds implausible for testdata")
      assert(keptToks >= kept * 10, s"$src kept docs below the length gate")
    }
  }

  test("mix_weights normalizes the smallest language to 1.0 and never upsamples") {
    val rows = q("mix_weights").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val minTok = rows.map(_._2).min
    rows.foreach { case (lang, n, ppm, sampled) =>
      assert(ppm <= 1000000L, s"$lang upsampled: $ppm ppm")
      assert(ppm == (minTok * 1000000L) / n, s"$lang weight drifted")
      assert(sampled <= minTok, s"$lang sampled $sampled above the $minTok budget")
      // floor arithmetic guarantee: ppm >= minTok*1e6/n - 1, so
      // sampled >= minTok - n/1e6 - 1 (n-based slack; a ppm-based bound
      // is wrong once minTok exceeds 1e6)
      assert(sampled >= minTok - n / 1000000L - 1,
        s"$lang sampled $sampled far below the $minTok budget")
    }
    assert(rows.filter(_._2 == minTok).forall(_._3 == 1000000L),
      "the floor language must keep all its tokens")
  }
}
