package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines (the
  * driver's beyond-reference extension surface; no KMR counterpart).
  *
  * Scale design: every variant is bucket-shuffled — exact dedup shuffles
  * on the content hash, Jaccard on the shingle (inverted index), MinHash
  * on (band, band-hash), SimHash on (band, band-bits). There is no
  * all-pairs crossJoin anywhere; candidate generation is always a
  * key-equality join, so the 100 TB plan is shuffle+join, not O(n²).
  * Signature computation (minhash/simhash) is per-row with higher-order
  * array functions — whole-stage-codegen'd, no UDFs, no extra shuffle.
  */
object Dedup {

  import TextNorm.{toks, normSql}

  /** Distinct word 3-gram shingles per doc. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("doc_id"), toks.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat(w[i],' ',w[i+1],' ',w[i+2]))")).as("gram"))
      .distinct()

  private val shinglesSql =
    s"""WITH toks AS (SELECT doc_id, $normSql AS w FROM documents),
        grams AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
          FROM toks WHERE len(w) >= 3)"""

  val defs: Seq[QueryDef] = Seq(

    // ---- Exact dedup: hash-groupBy on a normalized content hash. The
    // only shuffled payload is (hash, doc_id) — at 100 TB the text never
    // moves, and min(doc_id) keeps the canonical copy deterministically.
    QueryDef("dedup_exact", (s, d) => {
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          sha2(trim(regexp_replace(lower(col("text")), "\\s+", " ")), 256).as("content_hash"))
        .groupBy("content_hash")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy("keep_id")
    }, Some(
      "SELECT sha256(trim(regexp_replace(lower(text),'\\s+',' ','g'))) AS content_hash, " +
      "min(doc_id) AS keep_id, count(*) AS n_dups " +
      "FROM documents GROUP BY 1 ORDER BY keep_id")),

    // ---- Near-dup by exact n-gram Jaccard over an inverted shingle
    // index: join docs that SHARE a shingle (shuffle key = shingle),
    // count intersections, compute J = |∩|/|∪|. Exact but O(Σ df²) —
    // the scale path for unbounded corpora is dedup_minhash below.
    QueryDef("dedup_jaccard", (s, d) => {
      val grams = shingles(s, d)
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = grams.as("a")
        .join(grams.as("b"), col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(sizes.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
        .join(sizes.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
        .withColumn("jaccard",
          round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 6))
        .filter(col("jaccard") >= 0.6)
        .select("id1", "id2", "jaccard")
        .orderBy("id1", "id2")
    }, Some(
      shinglesSql +
      """, sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
         pairs AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
           FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id1, id2,
           round(CAST(inter AS DOUBLE)/(s1.n + s2.n - inter), 6) AS jaccard
         FROM pairs
         JOIN sizes s1 ON s1.doc_id = pairs.id1
         JOIN sizes s2 ON s2.doc_id = pairs.id2
         WHERE round(CAST(inter AS DOUBLE)/(s1.n + s2.n - inter), 6) >= 0.6
         ORDER BY id1, id2""".stripMargin)),

    // ---- MinHash + LSH banding: 64 fixed-seed permutations approximated
    // by min(xxhash64(gram # seed)); 16 bands × 4 rows. Candidates =
    // equality join on (band, band-hash); estimated J = matching
    // signature fraction. Hash functions are engine-specific, so there is
    // no SQL oracle — the MinHashSpec asserts recall against exact
    // Jaccard instead.
    QueryDef("dedup_minhash", (s, d) => minhashPairs(s, d, est = 0.5), None),

    // ---- Cluster the near-dup pairs into groups and pick one keeper
    // per group — the step that turns pairwise similarity into an actual
    // deduplicated corpus. Components via min-label propagation (rows-
    // only gate; DedupClusterSpec checks transitivity and a hand graph).
    QueryDef("dedup_clusters", (s, d) => {
      val pairs = minhashPairs(s, d, est = 0.5)
      // at the fixpoint, comp IS each component's minimum id — it is the
      // deterministic keeper directly
      connectedComponents(pairs.select("id1", "id2"), iters = 30)
        .groupBy(col("comp").as("keep_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .filter(col("cluster_size") > 1)
        .orderBy("keep_id")
    }, None),

    // ---- SimHash: 64-bit sign-of-weighted-bit-votes fingerprint over
    // tokens; candidates via 4 bands of 16 bits (hamming ≤ 3 guarantees
    // one exact band match by pigeonhole); verified by bit_count(xor).
    QueryDef("dedup_simhash", (s, d) => {
      // explode + 64 codegen'd sum aggregates (higher-order array folds
      // are interpreted expressions — a flat HashAggregate with map-side
      // partial aggregation is both faster and shuffle-light: one 64-int
      // vote row per doc per task crosses the wire).
      val th = Tables.load(s, d, "documents")
        .select(col("doc_id"), explode(toks).as("t"))
        .select(col("doc_id"), xxhash64(col("t")).as("h"))
      val voteCols = (0 until 64).map { k =>
        sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"v$k")
      }
      val sig = th.groupBy("doc_id")
        .agg(voteCols.head, voteCols.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(k =>
            when(col(s"v$k") >= 0, shiftleft(lit(1L), k)).otherwise(lit(0L)))
            .reduce(_ + _).as("sim"))
      val bands = sig.select(col("doc_id"), col("sim"),
          explode(expr("transform(sequence(0, 3), b -> " +
            "struct(b AS band, (shiftright(sim, b*16) & 65535) AS bits))")).as("bb"))
        .select(col("doc_id"), col("sim"), col("bb.band"), col("bb.bits"))
      bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("id1", "id2")
    }, None)
  )

  /** Connected components of an undirected pair graph by iterative
    * min-label propagation: every node repeatedly adopts the smallest
    * component id among itself and its neighbors. Converges in
    * O(component diameter) supersteps; each superstep is one shuffled
    * join + partial-aggregated min, linear in |edges|. `iters` is a
    * SAFETY CAP, not a tuning knob: hitting it before the fixpoint
    * throws (silently returning split components would make the dedup
    * keep duplicates). */
  def connectedComponents(pairs: DataFrame, iters: Int): DataFrame = {
    // symmetrize with ONE evaluation of the (possibly expensive) pairs
    // plan — a union of two selects would run it twice
    val edges = pairs.select(explode(array(
        struct(col("id1").as("a"), col("id2").as("b")),
        struct(col("id2").as("a"), col("id1").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .persist()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")).persist()
    labels.count()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < iters) {
      val prop = edges
        .join(labels.select(col("id").as("b"), col("comp").as("bcomp")), "b")
        .groupBy(col("a").as("id"))
        .agg(min("bcomp").as("ncomp"))
      // `labels` feeds the plan twice per superstep, so lineage would
      // grow exponentially — localCheckpoint truncates it every round.
      // The change flag rides along so the fixpoint test is one cheap
      // scan of the checkpoint, not another join.
      val next = labels.join(prop, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (col("ncomp").isNotNull && col("ncomp") < col("comp")).cast("long").as("chg"))
        .localCheckpoint(true)
      changed = next.agg(coalesce(sum("chg"), lit(0L))).collect()(0).getLong(0)
      labels.unpersist(false)
      labels = next.select("id", "comp")
      it += 1
    }
    edges.unpersist(false)
    require(changed == 0,
      s"connectedComponents did not converge within $iters supersteps " +
        "(component diameter exceeds the cap) — raise iters")
    labels
  }

  /** MinHash-LSH candidate pairs with estimated Jaccard ≥ `est`.
    * Exposed for the recall spec. */
  def minhashPairs(s: SparkSession, d: String, est: Double): DataFrame = {
    // Each shingle is hashed ONCE (two independent hashes); the 64
    // permutations are the universal family h_j = (h1 + j*h2) mod
    // (2^31-1) — the Mersenne-prime modulus decorrelates permutations and
    // 31-bit operands keep ANSI arithmetic far from overflow (63·2^31).
    // Signature = 64 codegen'd min-aggregates over the exploded shingles
    // (map-side partial min → one 64-long row per doc per task shuffles).
    val gh = shingles(s, d).select(col("doc_id"),
      (xxhash64(col("gram")).bitwiseAND(lit(2147483647L))).as("h1"),
      // pmod, not a bitmask: AND-ing with 0x7FFFFFFD cleared bit 1 and
      // halved the h2 seed space. pmod(x, P-1)+1 is uniform on [1, P-1].
      (pmod(xxhash64(concat(col("gram"), lit("!"))), lit(2147483646L)) + 1).as("h2"))
    // one native buffer aggregate (graft.functions.MinHashAgg) instead of
    // 64 min() columns — same values bit-for-bit, one tight loop per
    // shingle, still map-side partially aggregated
    val sig = gh.groupBy("doc_id")
      .agg(graft.functions.MinHashAgg.minhashSig(col("h1"), col("h2")).as("sig"))
    val bands = sig.select(col("doc_id"), col("sig"),
        explode(expr("transform(sequence(0, 15), b -> " +
          "struct(b AS band, xxhash64(slice(sig, b*4+1, 4)) AS bh))")).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bh"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        round(expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v)) / CAST(64 AS DOUBLE)"), 4)
          .as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= est)
      .orderBy("id1", "id2")
  }
}
