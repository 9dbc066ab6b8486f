package graft.llm

import graft.{SparkSuite, Tables}

/** SemDeDup (arXiv:2303.09540) over the persisted IVF cells: the engine
  * output must equal an independent sequential replay of the whole
  * pipeline — Lloyd centroid training (first-⌈√n⌉ init, cosine-argmax
  * assignment, DECIMAL(28,12) component means), final assignment,
  * centroid similarity, intra-cell pair cosine, the keep-low-centroid-
  * similarity eviction rule — and the per-query plan must read only the
  * index tables. */
class SemDedupSpec extends SparkSuite {

  private val LloydIters = 2
  private val Eps = 0.4

  /** Ascending-index double dot — bit-identical to DotProductD. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))

  private def cos(a: (Array[Double], Double), b: (Array[Double], Double)): Option[Double] = {
    val den = a._2 * b._2
    if (den == 0) None else Some(dot(a._1, b._1) / den)
  }

  /** cosine-argmax cell for one vector: highest centroid cosine, ties →
    * lowest cid, undefined → -Inf. */
  private def assignOne(v: (Array[Double], Double),
      cents: Seq[(Long, (Array[Double], Double))]): Long =
    cents.map { case (cid, c) =>
      (cos(c, v).getOrElse(Double.NegativeInfinity), cid)
    }.minBy { case (c, cid) => (-c, cid) }._2

  /** Sequential Lloyd replay: the exact arithmetic chain the engine and
    * the DuckDB oracle share — per-component sums as DECIMAL(28,12)
    * (HALF_UP, the value Spark's try_cast produces), nearest-double of
    * the exact sum, then one IEEE division. */
  private def lloydReplay(withNrm: Map[Long, (Array[Double], Double)],
      k: Int): Seq[(Long, (Array[Double], Double))] = {
    var cents: Seq[(Long, (Array[Double], Double))] =
      withNrm.keys.toSeq.sorted.take(k).map(id => id -> withNrm(id))
    for (_ <- 1 to LloydIters) {
      val members = withNrm.toSeq
        .map { case (id, v) => (assignOne(v, cents), id) }
        .groupBy(_._1)
      cents = cents.map { case (cid, prev) =>
        members.get(cid) match {
          case None => (cid, prev)
          case Some(ms) =>
            val vs = ms.map(m => withNrm(m._2)._1)
            val dim = vs.map(_.length).max
            val ce = Array.tabulate(dim) { i =>
              val sum = vs.foldLeft(BigDecimal(0)) { (acc, v) =>
                acc + BigDecimal(v(i)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
              }
              sum.toDouble / vs.length
            }
            (cid, (ce, nrm(ce)))
        }
      }
    }
    cents
  }

  test("semdedup equals a sequential reference replay") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .filter(_._2 != null).toMap
    val withNrm = vecs.map { case (id, e) => id -> (e, nrm(e)) }
    val k = math.max(16, math.ceil(math.sqrt(withNrm.size.toDouble)).toInt)
    val cents = lloydReplay(withNrm, k).toMap

    // final assignment under the trained centroids
    val assigned = withNrm.map { case (id, v) =>
      val cid = assignOne(v, cents.toSeq)
      (id, cid, cos(cents(cid), v).getOrElse(Double.NegativeInfinity))
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
          BigDecimal(ps.map(_._2).max * 1000000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
    }.sortBy(r => (r._1, r._2))

    val engine = AnnOps.semDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(engine.nonEmpty, "fixture produced no near-dup pairs — raise Eps coverage")
    assert(engine == evictRows)
  }

  test("semdedup plan reads only the index tables — no embeddings scan") {
    AnnOps.semDedup(spark, sfDir).collect() // ensure the index is built
    val plan = AnnOps.semDedup(spark, sfDir).queryExecution.optimizedPlan.toString()
    assert(!plan.contains("embeddings"), s"semdedup re-reads the corpus:\n$plan")
  }

  test("semdedup_delta: every reported near-dup is real (driver-side cosine " +
      "replay), sides respect the delta split, and the plan reads only the index") {
    val q = graft.SparkEntry.queries("semdedup_delta")
    val out = q(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty, "fixture produced no delta near-dups — widen the shard")
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val withNrm = vecs.map { case (id, e) => id -> (e, nrm(e)) }
    out.foreach { case (deltaId, nNear, bestId, maxMicro) =>
      assert(deltaId % 8 == 7, s"delta side must be the %8==7 shard: $deltaId")
      assert(bestId % 8 != 7, s"best match must come from the base corpus: $bestId")
      assert(nNear >= 1L)
      val c = cos(withNrm(deltaId), withNrm(bestId))
        .getOrElse(fail(s"undefined cosine for reported pair $deltaId/$bestId"))
      assert(c >= Eps, s"reported best pair below threshold: $c")
      assert(maxMicro >= BigDecimal(c * 1000000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
        "max_cos_micro must dominate the best pair's cosine")
    }
    val plan = q(spark, sfDir).queryExecution.optimizedPlan.toString()
    assert(!plan.contains("embeddings"), s"delta probe re-reads the corpus:\n$plan")
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
