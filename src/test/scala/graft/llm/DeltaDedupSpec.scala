package graft.llm

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** The r15 steady-state ingest gates for the winnow and shingle
  * families: `dedup_substring_delta` / `dedup_jaccard_delta`. Each is
  * pinned two ways — value parity against a driver-side replay that
  * derives BOTH sides from text (so a stale or corrupt persisted index
  * would diverge: served ≡ inline), and plan shape (the O(delta) claim:
  * the text→fingerprint pipeline runs on the DELTA side only; the base
  * side is the bucketed index scan). */
class DeltaDedupSpec extends SparkSuite {

  private def srcOf: Map[Long, String] =
    Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("dedup_substring_delta equals an all-from-text winnow replay (served ≡ inline)") {
    val got = graft.SparkEntry.queries("dedup_substring_delta")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val src = srcOf
    val fps = Dedup.winnowFps(Tables.load(spark, sfDir, "documents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val base = fps.filter { case (id, _) => src(id) == "src0" }
    val delta = fps.filter { case (id, _) => src(id) != "src0" }
    val df = base.groupBy(_._2).map { case (fp, v) => fp -> v.length }
    val byFp = base.filter { case (_, fp) => df(fp) <= Dedup.WinnowDfCap }.groupBy(_._2)
    val exp = delta.flatMap { case (did, fp) =>
      byFp.getOrElse(fp, Array.empty[(Long, Long)]).map { case (bid, _) => (did, bid) }
    }.groupBy(identity).map { case ((did, bid), v) => (did, bid, v.length.toLong) }.toSet
    assert(got == exp, s"gate ${got.size} pairs vs replay ${exp.size}")
    assert(got.nonEmpty, "sf0.001 should contain delta-vs-base substring pairs")
  }

  test("dedup_jaccard_delta equals an all-from-text shingle replay (served ≡ inline)") {
    val got = graft.SparkEntry.queries("dedup_jaccard_delta")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val src = srcOf
    val grams = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TextNorm.toks.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat(w[i],' ',w[i+1],' ',w[i+2]))")).as("gram"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val base = grams.filter { case (id, _) => src(id) == "src0" }
    val delta = grams.filter { case (id, _) => src(id) != "src0" }
    val df = base.groupBy(_._2).map { case (g, v) => g -> v.length }
    val byGram = base.filter { case (_, g) => df(g) <= Dedup.JaccardDfCap }.groupBy(_._2)
    val n1 = delta.groupBy(_._1).map { case (id, v) => id -> v.length }
    val n2 = base.groupBy(_._1).map { case (id, v) => id -> v.length }
    val exp = delta.flatMap { case (did, g) =>
      byGram.getOrElse(g, Array.empty[(Long, String)]).map { case (bid, _) => (did, bid) }
    }.groupBy(identity).flatMap { case ((did, bid), v) =>
      val inter = v.length
      val j = BigDecimal(inter.toDouble / (n1(did) + n2(bid) - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (j >= 0.6) Some((did, bid, j)) else None
    }.toSet
    assert(got == exp, s"gate ${got.size} pairs vs replay ${exp.size}")
    assert(got.nonEmpty, "sf0.001 should contain delta-vs-base jaccard pairs")
  }

  test("delta plans recompute text fingerprints on the delta side only") {
    // O(delta) shape: exactly one winnow_fps over the documents text in
    // the substring gate (the delta batch); the base side must arrive
    // via the BASE-SPLIT persisted index + stat relations (r16 — the
    // production serve plan), not a second winnow or a whole-corpus
    // index filtered per query.
    val sub = graft.SparkEntry.queries("dedup_substring_delta")(spark, sfDir)
      .queryExecution.optimizedPlan.toString()
    assert("winnow_fps".r.findAllIn(sub).size == 1,
      s"expected exactly one delta-side winnow in:\n$sub")
    assert(sub.contains("winnow_idx_base"),
      s"base side should scan the base-split winnow index:\n$sub")
    assert(sub.contains("winnow_df_base"),
      s"the df stop-list should serve from the persisted base stat table:\n$sub")
    val jac = graft.SparkEntry.queries("dedup_jaccard_delta")(spark, sfDir)
      .queryExecution.optimizedPlan.toString()
    // EXACTLY one delta-side shingle explode: n1 rides the probe rows
    // map-only (shingleRowsWithN1), so the r16 first-cut's second
    // delta derivation (the n1 groupBy) must never reappear — and a
    // corpus-sized shingle derivation would also show here (the base
    // side arrives via the persisted index relation)
    assert("explode".r.findAllIn(jac).size == 1,
      s"expected exactly one delta-side shingle explode in:\n$jac")
    assert(jac.contains("shingle_idx_base"),
      s"base side should scan the base-split shingle index:\n$jac")
    assert(jac.contains("shingle_df_base"),
      s"the stop-gram list should serve from the persisted base stat table:\n$jac")
    // the Jaccard denominator must come from the persisted per-doc size
    // table, not a corpus-wide re-aggregation of the posting list
    assert(jac.contains("shingle_sizes_base"),
      s"base sizes should serve from the persisted base stat table:\n$jac")
  }

  test("delta plans contain NO base-side aggregate — the persisted stat " +
      "tables ARE the stop lists (r16, the production-plan pin)") {
    // Structural form of the O(delta) claim: every Aggregate in the
    // optimized plan must read the delta batch (a path-based documents
    // scan somewhere under it). An Aggregate whose leaves are ALL
    // catalog tables is a per-ingest re-derivation of index state —
    // exactly the O(corpus)-IO-per-batch shape the base-split stat
    // tables exist to remove (the r15 gates had two: the df stop-list
    // groupBy and, transitively, the sizes re-aggregate).
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    def pureIndexAggregates(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case a: Aggregate if a.collectLeaves().nonEmpty &&
            a.collectLeaves().forall {
              case r: LogicalRelation => r.catalogTable.isDefined
              case _ => false
            } => a.simpleString(120)
      }
    // negative control: the detector must fire on the exact shape it
    // bans (the r15 per-ingest df groupBy over the index) — otherwise
    // a Catalyst representation change could blunt the pin silently
    val banned = Dedup.shingleIndexBase(spark, sfDir)
      .groupBy("gram").agg(count(lit(1)).as("df"))
    assert(pureIndexAggregates(banned).nonEmpty,
      "the pure-index-aggregate detector no longer fires on a base-side groupBy")
    for (g <- Seq("dedup_substring_delta", "dedup_jaccard_delta",
        "dedup_paragraph_delta", "dedup_delta", "dedup_incremental")) {
      val bad = pureIndexAggregates(graft.SparkEntry.queries(g)(spark, sfDir))
      assert(bad.isEmpty,
        s"$g re-aggregates persisted index state per ingest:\n${bad.mkString("\n")}")
    }
  }

  test("dedup_delta computes delta signatures from text and probes the " +
      "base-split band index; dedup_incremental anti-joins the persisted " +
      "base hash set (r16)") {
    val md = graft.SparkEntry.queries("dedup_delta")(spark, sfDir)
      .queryExecution.optimizedPlan.toString()
    assert(md.contains("minhash_idx_base"),
      s"corpus side should scan the base-split band index:\n$md")
    // ONLY the base index relation — the whole-corpus index must not
    // appear (every minhash_idx mention is the _base table)
    assert("minhash_idx".r.findAllIn(md).size ==
      "minhash_idx_base".r.findAllIn(md).size,
      s"whole-corpus minhash index must not appear in the delta plan:\n$md")
    val inc = graft.SparkEntry.queries("dedup_incremental")(spark, sfDir)
      .queryExecution.optimizedPlan.toString()
    assert(inc.contains("content_h_base"),
      s"corpus hash set should serve from the persisted base table:\n$inc")
  }

  test("dedup_paragraph_delta probes the persisted base chunk-hash set " +
      "and chunks only the delta text (r16)") {
    val plan = graft.SparkEntry.queries("dedup_paragraph_delta")(spark, sfDir)
      .queryExecution.optimizedPlan.toString()
    assert(plan.contains("chunk_h_base"),
      s"membership set should serve from the persisted base table:\n$plan")
    // exactly one chunking pass — the delta batch; the r15 shape read
    // the whole chunk index on BOTH sides of the probe
    assert(!plan.contains("chunk_idx"),
      s"the whole-corpus chunk index must not appear in the delta plan:\n$plan")
  }
}
