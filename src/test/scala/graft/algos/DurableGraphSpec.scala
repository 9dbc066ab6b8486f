package graft.algos

import graft.SparkSuite

/** Durable coPairs (round-8 verdict item 6): the sparsified edge table
  * is written once per corpus; a fresh catalog re-registers without
  * rebuilding, and the served rows equal the inline build. */
class DurableGraphSpec extends SparkSuite {

  test("persisted edge table equals the inline build") {
    val built = Graph.coPairsBuild(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = Graph.coPairsTable(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == built)
    assert(served.nonEmpty)
  }

  test("persisted trade-edge table equals the inline build (incl. degrees)") {
    val built = Iterative.tradeEdgesDegBuild(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val served = Iterative.tradeEdgesTable(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == built)
    assert(served.nonEmpty)
  }

  test("a cold catalog re-registers the trade-edge table without rewriting files") {
    Iterative.tradeEdgesTable(spark, sfDir).count() // ensure built
    val sfx = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val dir = graft.sources.ServedIndex.activeDir(spark, s"tradeedges$sfx")
    val mtimes = dir.listFiles().filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(mtimes.nonEmpty)
    spark.sql(s"DROP TABLE IF EXISTS tradeedges$sfx") // a new session's view
    assert(Iterative.tradeEdgesTable(spark, sfDir).count() > 0)
    val after = dir.listFiles().filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after == mtimes, "re-registration must not rewrite the edge table")
  }

  test("a cold catalog re-registers the edge table without rewriting files") {
    Graph.coPairsTable(spark, sfDir).count() // ensure built
    val sfx = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val dir = graft.sources.ServedIndex.activeDir(spark, s"copairs$sfx")
    val mtimes = dir.listFiles().filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(mtimes.nonEmpty)
    spark.sql(s"DROP TABLE IF EXISTS copairs$sfx") // a new session's view
    assert(Graph.coPairsTable(spark, sfDir).count() > 0)
    val after = dir.listFiles().filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after == mtimes, "re-registration must not rewrite the edge table")
  }
}
