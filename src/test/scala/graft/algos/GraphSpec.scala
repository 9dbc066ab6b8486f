package graft.algos

import graft.{SparkSuite, SparkEntry}
import org.apache.spark.sql.functions._

/** BFS invariants for bfs_hops, checked against an independently
  * rebuilt edge set (the same deterministic top-2000 sparsification,
  * recomputed here rather than shared, so a bug in the query's edge
  * construction cannot self-certify). */
class GraphSpec extends SparkSuite {

  private def edges(): Set[(Long, Long)] = {
    val l = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey")
    val l2 = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val pairs = l
      .join(l2, col("l_orderkey") === col("o2") && col("l_suppkey") < col("s2"))
      .groupBy(col("l_suppkey").as("u"), col("s2").as("v"))
      .agg(count(lit(1)).as("support"))
      .orderBy(desc("support"), col("u"), col("v")).limit(2000)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.flatMap(p => Seq(p, p.swap)).toSet
  }

  test("bfs_hops: hops match a sequential BFS replay on the same graph") {
    val e = edges()
    val adj = e.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = e.map(_._1).filter(_ % 10 == 0)
    // sequential 4-round BFS
    var dist = seeds.map(_ -> 0L).toMap
    for (h <- 1 to 4) {
      val frontier = dist.collect { case (id, hop) if hop == h - 1 => id }
      val reached = frontier.flatMap(id => adj.getOrElse(id, Set.empty))
      dist = reached.foldLeft(dist)((m, id) =>
        if (m.contains(id)) m else m + (id -> h.toLong))
    }
    val out = SparkEntry.queries("bfs_hops")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == dist, s"BFS mismatch: engine ${out.size} rows, replay ${dist.size}")
  }

  test("clustering_coeff: corner counts sum to 3x the triangle total; coeffs in [0, 1000]") {
    val rows = SparkEntry.queries("clustering_coeff")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val nTriangles = SparkEntry.queries("triangle_count")(spark, sfDir)
      .collect().head.getLong(1)
    // each triangle contributes one count to each of its three corners
    assert(rows.map(_._3).sum == 3L * nTriangles,
      s"corner sum ${rows.map(_._3).sum} != 3 * $nTriangles")
    rows.foreach { case (id, deg, nTri, coeff) =>
      if (deg <= 1) assert(coeff.isEmpty, s"vertex $id: deg-$deg coeff must be NULL")
      else {
        assert(coeff.exists(c => c >= 0L && c <= 1000L), s"vertex $id: coeff $coeff")
        // a vertex's triangles cannot exceed its wedge count
        assert(nTri <= deg * (deg - 1) / 2, s"vertex $id: $nTri triangles, deg $deg")
      }
    }
    // independent brute-force triangle count per vertex on the replayed edges
    val e = edges()
    val adj = e.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = rows.map { case (id, _, _, _) =>
      val ns = adj.getOrElse(id, Set.empty).toSeq
      id -> ns.combinations(2).count(p => adj.getOrElse(p(0), Set.empty)(p(1))).toLong
    }.toMap
    assert(rows.map(r => r._1 -> r._3).toMap == expect, "per-vertex triangle census mismatch")
  }
}
