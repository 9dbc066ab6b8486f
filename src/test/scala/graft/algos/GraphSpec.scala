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
}
