package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Quality properties of the approximate (non-oracled) operators:
  * MinHash-LSH and SimHash recall vs exact Jaccard; IVF recall vs the
  * brute-force cosine baseline. Thresholds are fixed-seed deterministic
  * for the synthetic corpus. */
class LlmSpec extends SparkSuite {

  test("lloyd training stride matches the oracle's greatest(1, n // cap) at the boundaries") {
    // the oracle replays `vec_id % m = 0` with m = greatest(1, n//16384);
    // a drift here (ceil vs floor, off-by-one at the cap) would show up
    // only at >cap corpora — beyond every gate SF, so pin it here
    assert(AnnOps.trainStride(0L) == 1L)
    assert(AnnOps.trainStride(16383L) == 1L)
    assert(AnnOps.trainStride(16384L) == 1L)
    assert(AnnOps.trainStride(32767L) == 1L)
    assert(AnnOps.trainStride(32768L) == 2L)
    assert(AnnOps.trainStride(40000L) == 2L)
    assert(AnnOps.trainStride(198227L) == 12L) // the sf10 corpus
  }

  test("minhash-LSH finds every pair with exact Jaccard >= 0.8 (recall)") {
    val exact = Dedup.defs.find(_.name == "dedup_jaccard").get
      .fn(spark, sfDir).filter(col("jaccard") >= 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.minhashPairs(spark, sfDir, est = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus has no high-jaccard pairs — threshold too high")
    val missed = exact -- found
    assert(missed.isEmpty, s"minhash missed high-similarity pairs: $missed")
  }

  test("minhash estimated Jaccard tracks exact Jaccard within 0.25") {
    val exact = Dedup.defs.find(_.name == "dedup_jaccard").get.fn(spark, sfDir)
      .select(col("id1"), col("id2"), col("jaccard"))
    val est = Dedup.minhashPairs(spark, sfDir, est = 0.5)
      .select(col("id1"), col("id2"), (col("n_match") / 64.0).as("est_jaccard"))
    val both = exact.join(est, Seq("id1", "id2")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (j, e) = (r.getDouble(2), r.getDouble(3))
      assert(math.abs(j - e) <= 0.25, s"pair (${r.getLong(0)},${r.getLong(1)}): exact $j est $e")
    }
  }

  test("simhash candidates are symmetric-free and verified by hamming") {
    val pairs = Dedup.defs.find(_.name == "dedup_simhash").get.fn(spark, sfDir).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not canonicalized id1 < id2")
      assert(r.getLong(2) <= 3, s"hamming ${r.getLong(2)} above threshold")
    }
  }

  test("IVF top-k achieves >= 0.4 recall@5 vs brute force and never beats it") {
    val exact = AnnOps.bruteForceTopk(spark, sfDir)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = AnnOps.ivfTopk(spark, sfDir)
      .select("qid", "vec_id", "cos_sim").collect()
    val ivfSet = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivfSet).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall@5 = $recall")
    // IVF cosine values must be genuine (≤ the exact top-1 per query)
    val bestExact = AnnOps.bruteForceTopk(spark, sfDir)
      .filter(col("rk") === 1).select("qid", "cos_sim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach { r =>
      assert(r.getDouble(2) <= bestExact(r.getLong(0)) + 1e-9)
    }
  }

  test("quantized re-rank achieves >= 0.6 recall@10 vs brute force; scores are genuine") {
    val exact = AnnOps.bruteForceTopk(spark, sfDir)
      .select("qid", "vec_id", "cos_sim").collect()
    val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = graft.SparkEntry.queries("ann_rerank")(spark, sfDir)
      .select("qid", "vec_id", "cos_sim").collect()
    val rrSet = rr.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactSet & rrSet).size.toDouble / exactSet.size
    // int8 quantization distorts the prefilter order, but a 50-candidate
    // pool for a top-10 answer should keep well over half the true set
    assert(recall >= 0.6, s"re-rank recall@10 = $recall")
    // re-ranked cosines are exact — any (qid, vec_id) also in the brute
    // set must carry the identical rounded score
    val exactScore = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rr.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      exactScore.get(k).foreach(s => assert(r.getDouble(2) == s,
        s"re-ranked score differs from exact for $k"))
    }
  }

  test("RP-LSH near-dup pairs are a sound, non-empty subset of the exact cos>=0.4 pairs") {
    // Soundness: every emitted pair really has cosine >= 0.4 (the re-rank
    // is exact, so LSH can only lose pairs, never invent them). Recall is
    // geometry-dependent (8 bands x 8 bits at tau=0.4 keeps ~20% on this
    // corpus) — the gate pins the exact output against DuckDB, so here we
    // check soundness + non-triviality, not a recall floor.
    val lsh = AnnOps.defs.find(_.name == "dedup_embedding_lsh").get
      .fn(spark, sfDir).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty, "RP-LSH produced no pairs at test scale")
    lsh.foreach { case (a, b) => assert(a < b, s"pair ($a,$b) not canonicalized") }
    // exact pairs >= 0.4 via the brute-force formula on the same table
    import spark.implicits._
    val v = graft.Tables.load(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0) Double.NaN else d / den
    }
    lsh.foreach { case (a, b) =>
      val c = cos(v(a), v(b))
      assert(c >= 0.4 - 1e-9, s"pair ($a,$b) emitted with exact cosine $c < 0.4")
    }
  }

  test("jaccard df-cap prunes a synthetic hot shingle without touching cold pairs") {
    import spark.implicits._
    // docs 0 and 1 overlap ONLY on the boilerplate shingle "common header
    // line", which also appears in 20 filler docs (df = 22); docs 100/101
    // overlap on two rare shingles (df = 2).
    val hot = "common header line"
    val docs = (Seq(
        (0L, s"$hot alpha beta gamma"),
        (1L, s"$hot delta epsilon zeta")) ++
      (2L to 21L).map(i => (i, s"$hot filler$i fillerx$i fillery$i")) ++
      Seq((100L, "rare unique shingle pair one"),
          (101L, "rare unique shingle pair two"))).toDF("doc_id", "text")
    def pairsAt(cap: Long) = Dedup.jaccardPairs(docs, minJ = 0.01, dfCap = cap)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairsAt(Long.MaxValue)
    val capped = pairsAt(5L)
    assert(uncapped.contains((0L, 1L)), "uncapped run must see the hot-gram-only pair")
    assert(!capped.contains((0L, 1L)),
      "the cap must prune the pair whose only overlap is the hot gram")
    assert(uncapped.contains((100L, 101L)) && capped.contains((100L, 101L)),
      "a cold rare-gram pair must survive the cap")
  }

  test("winnowing substring dedup honors its 47-char guarantee and alignment independence") {
    import spark.implicits._
    val span = "X" * 20 + "shared-boilerplate-span-0123456789" // 54 chars, > 47
    // doc 1 embeds the span at a DIFFERENT offset than doc 0 — stride
    // sampling would miss this; winnowing must not.
    val docs = Seq(
      (0L, "prefix-a " * 10 + span + " tail-a " * 10),
      (1L, "completely different lead-in text here! " + span + " other-tail " * 12),
      (2L, "no overlap with anyone at all, just filler words repeated " * 5),
      (3L, "another loner document with its own unique content stream " * 5),
      (4L, "tiny doc under 47 chars"), // must be dropped, never error
      (5L, "x" * 46)) // one char below the threshold boundary
      .toDF("doc_id", "text")
    val pairs = Dedup.substringPairs(docs, dfCap = 50L)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)),
      "docs sharing a 54-char span at different offsets must pair")
    assert(!pairs.exists(p => Set(p._1, p._2).exists(Set(2L, 3L, 4L, 5L))),
      s"disjoint and sub-threshold docs must not pair: $pairs")
  }

  test("connectedComponents labels a hand graph correctly") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, singleton 20 via self-pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 20L))
      .toDF("id1", "id2")
    val comp = Dedup.connectedComponents(pairs, iters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connectedComponents converges on a 200-node path well under the cap") {
    import spark.implicits._
    // path 0-1-2-…-199: diameter 199. Min-label propagation needed
    // O(diameter) supersteps (≫ the production cap of 30); the
    // large-star/small-star contraction must finish in O(log n) rounds —
    // iters=15 here both proves the bound and would throw on regression.
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("id1", "id2")
    val comp = Dedup.connectedComponents(pairs, iters = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp.size == 200)
    comp.foreach { case (id, c) => assert(c == 0L, s"node $id labeled $c, want 0") }
  }

  test("dedup clusters are transitively consistent with the pair graph") {
    val pairs = Dedup.minhashPairs(spark, sfDir, est = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val comp = Dedup.connectedComponents(
      Dedup.minhashPairs(spark, sfDir, est = 0.5).select("id1", "id2"), iters = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    pairs.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"pair ($a,$b) split across components")
    }
  }

  test("embed_quantize stays inside the int8 envelope") {
    val rows = AnnOps.defs.find(_.name == "embed_quantize").get.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val dim = graft.Tables.load(spark, sfDir, "embeddings")
      .selectExpr("size(embedding)").first().getInt(0)
    rows.foreach { r =>
      assert(r.getDouble(1) > 0.0, "scale must be positive")
      val l1 = r.getLong(2)
      assert(l1 >= 127 && l1 <= 127L * dim,
        s"vec ${r.getLong(0)}: L1 $l1 outside [127, ${127L * dim}] — " +
          "the max-|x| component must quantize to exactly ±127")
    }
  }

  test("exact dedup groups sum to the corpus size") {
    val df = Dedup.defs.find(_.name == "dedup_exact").get.fn(spark, sfDir)
    val total = df.agg(sum("n_dups")).collect()(0).getLong(0)
    assert(total == graft.Tables.load(spark, sfDir, "documents").count())
  }

  test("bm25_topk: scores match a driver-side replay; ranking is score-desc with id tiebreak") {
    val out = graft.SparkEntry.queries("bm25_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty, "query terms must hit the corpus")
    // replay the aggregate + formula sequentially with the same IEEE ops
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(graft.llm.TextNorm.normText.as("nt"), col("doc_id"))
      .collect().filter(r => !r.isNullAt(0) && r.getString(0).nonEmpty)
      .map(r => (r.getLong(1), r.getString(0).split(" ", -1)))
    val nDocs = docs.length.toDouble
    val sumDl = docs.map(_._2.length.toLong).sum.toDouble
    val terms = Seq("spark", "merge", "window")
    val dfs = terms.map(t => docs.count(_._2.contains(t)).toDouble)
    def score(ws: Array[String]): Double = {
      val dl = ws.length.toDouble
      terms.zip(dfs).map { case (t, df) =>
        val tf = ws.count(_ == t).toDouble
        ((nDocs - df + 0.5) / (df + 0.5)) *
          ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ((dl * nDocs) / sumDl))))
      }.sum
    }
    val expect = docs.map { case (id, ws) => (id, score(ws)) }
      .filter(_._2 > 0).map { case (id, sc) =>
        (id, BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (id, sc) => (-sc, id) }.take(20)
    assert(out.map(r => (r._1, r._6)).toSeq == expect.toSeq,
      s"bm25 ranking mismatch:\nengine=${out.map(r => (r._1, r._6)).mkString(",")}\nreplay=${expect.mkString(",")}")
  }

  test("collocations: PMI ppm matches an exact BigInt replay; ranking total-ordered") {
    val out = graft.SparkEntry.queries("collocations")(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(out.nonEmpty)
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(graft.llm.TextNorm.normText.as("nt")).collect()
      .filter(!_.isNullAt(0)).map(_.getString(0).split(" ", -1).filter(_.nonEmpty))
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTok = uni.values.sum
    val bg = docs.flatMap(ws => ws.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).filter(_._2 >= 5L)
    val expect = bg.map { case ((w1, w2), cxy) =>
      val pmi = (BigInt(1000000) * BigInt(nTok) * BigInt(cxy) /
        (BigInt(uni(w1)) * BigInt(uni(w2)))).toLong
      ((w1, w2), (cxy, uni(w1), uni(w2), pmi))
    }.toSeq.sortBy { case ((w1, w2), v) => (-v._4, w1, w2) }.take(25)
    assert(out.toSeq == expect, s"collocation mismatch:\n${out.toSeq}\nvs\n$expect")
  }

  test("source_diversity: Gini ppm matches a BigInt replay and sits in [0, 1e6)") {
    val out = graft.SparkEntry.queries("source_diversity")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val raw = graft.Tables.load(spark, sfDir, "documents")
      .select("lang", "source").collect().map(r => (r.getString(0), r.getString(1)))
    raw.groupBy(_._1).foreach { case (lang, vs) =>
      val counts = vs.groupBy(_._2).values.map(_.size.toLong).toSeq
      val n = counts.sum
      val ssq = counts.map(c => BigInt(c) * BigInt(c)).sum
      val gini = 1000000L - (BigInt(1000000) * ssq / (BigInt(n) * BigInt(n))).toLong
      assert(out(lang) == ((n, counts.length.toLong, gini)), s"diversity mismatch for $lang")
      assert(gini >= 0L && gini < 1000000L)
    }
  }

  test("dedup_eval: counts reconcile with the member pipelines; boundary docs split correctly") {
    import spark.implicits._
    // gate corpus: confusion counts must equal an independent recount of
    // the two (already individually spec'd) pair sets
    val Array(nT, nC, nH, p, r) = graft.SparkEntry.queries("dedup_eval")(spark, sfDir)
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val truth = Dedup.jaccardPairs(docs, 0.5, Dedup.JaccardDfCap)
      .select("id1", "id2").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val cand = Dedup.minhashPairs(spark, sfDir, 0.5)
      .select("id1", "id2").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert((nT, nC, nH) == ((truth.size.toLong, cand.size.toLong, (truth & cand).size.toLong)))
    assert(nH <= math.min(nT, nC))
    assert(p == 1000000L * nH / nC && r == 1000000L * nH / nT)
    // boundary corpus: a sub-threshold pair (J ~ 0.2) must count as
    // neither truth nor hit even if LSH happens to propose it
    val dir = java.nio.file.Files.createTempDirectory("dedup_eval_spec").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 38).map(i => s"tok$i").mkString(" ") + " alt39 alt40"
    val far = ((1 to 10).map(i => s"tok$i") ++ (1 to 30).map(i => s"zzz$i")).mkString(" ")
    Seq((1L, base, "en", "web", 200L), (2L, near, "en", "web", 200L),
      (3L, far, "en", "web", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val Array(t2, _, h2, _, _) = graft.SparkEntry.queries("dedup_eval")(spark, dir)
      .collect()(0).toSeq.map(v => if (v == null) -1L else v.asInstanceOf[Long]).toArray
    assert(t2 == 1L, s"expected exactly the (1,2) truth pair, got $t2")
    assert(h2 <= t2)
  }

  test("oov_rate: in-vocab mass equals the independent top-1000 head mass; ppm bounded") {
    val out = graft.SparkEntry.queries("oov_rate")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.foreach { case (id, nToks, nOov, ppm) =>
      assert(nOov <= nToks && ppm >= 0 && ppm <= 1000000L, s"doc $id out of range")
      assert(ppm == 1000000L * nOov / nToks, s"doc $id ppm inconsistent")
    }
    // conservation: tokens NOT counted as OOV must equal the total
    // occurrence count of the top-1000 vocabulary, rebuilt independently
    val tokCounts = graft.Tables.load(spark, sfDir, "documents")
      .select("text").collect()
      .flatMap(r => r.getString(0).toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val headMass = tokCounts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(1000).map(_._2).sum
    val inVocabMass = out.map(t => t._2 - t._3).sum
    assert(inVocabMass == headMass, s"$inVocabMass != head mass $headMass")
    assert(out.map(_._2).sum == tokCounts.values.sum, "token totals drifted")
  }

  test("label_centroids: sums match a BigInt replay; NaN components shrink n_vecs, not the sum") {
    val out = graft.SparkEntry.queries("label_centroids")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val raw = graft.Tables.load(spark, sfDir, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    raw.groupBy(_._1).foreach { case (label, vs) =>
      val dims = vs.head._2.length
      (0 until dims).foreach { dim =>
        // float->double is exact; HALF_UP (away from zero) mirrors
        // Spark/DuckDB round(); math.round would differ on negative .5
        val valid = vs.map(_._2(dim)).filterNot(_.isNaN).map { x =>
          new java.math.BigDecimal(x.toDouble * 1000000)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue
        }
        val sum = valid.map(BigInt(_)).sum
        val expect = (valid.size.toLong, sum.toLong, (sum / valid.size).toLong)
        assert(out((label, dim.toLong)) == expect,
          s"($label, $dim): ${out((label, dim.toLong))} != $expect")
      }
    }
    assert(out.size == 640)
  }

  test("lexical_diversity: TTR matches a driver-side replay; degenerate text scores low") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("lexical_diversity")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val raw = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    raw.foreach { case (id, text) =>
      val t = text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1)
      val expect = (t.length.toLong, t.distinct.length.toLong,
        1000000L * t.distinct.length / t.length)
      assert(out(id) == expect, s"doc $id: ${out(id)} != $expect")
      assert(out(id)._3 > 0 && out(id)._3 <= 1000000L)
    }
    // a pure template (one token repeated) must floor the score
    val dir = java.nio.file.Files.createTempDirectory("ttr_spec").toString
    Seq((1L, ("spam " * 50).trim, "en", "web", 249L),
      (2L, (1 to 50).map(i => s"w$i").mkString(" "), "en", "web", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = graft.SparkEntry.queries("lexical_diversity")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m(1L) == 1000000L / 50 && m(2L) == 1000000L, m.toString)
  }

  test("dedup_containment: catches a fully-embedded doc that Jaccard misses") {
    import spark.implicits._
    val small = (1 to 5).map(i => s"token$i").mkString(" ")
    val big = small + " " + (6 to 80).map(i => s"filler$i").mkString(" ")
    val distinctDoc = (100 to 180).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, distinctDoc))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, minMilli = 800L, dfCap = 1000L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    // every shingle of the small doc appears in the big one -> containment 1.0
    assert(cont.get((1L, 2L)).contains(1000L),
      s"embedded doc not caught: $cont")
    assert(!cont.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must produce no containment pair")
    // ...while symmetric Jaccard at the dedup_jaccard threshold is blind to it
    val jac = Dedup.jaccardPairs(docs, minJ = 0.6, dfCap = 1000L).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "precondition broken: Jaccard should score the embedding far below 0.6")
  }
}
