package graft.sources

import graft.SparkSuite

/** Per-KV command execution (kmr_map_ms_commands parity): shell path,
  * fork-exec path, order preservation under concurrency, and failure
  * tolerance. */
class CmdFarmSpec extends SparkSuite {

  private def farm(kvs: Seq[(String, String)], conc: Int = 4): Seq[(String, String)] = {
    import spark.implicits._
    CmdFarm.mapCommands(kvs.toDS.repartition(2), conc).collect().toSeq
  }

  test("shell path: each value runs as its own command, stdout captured per key") {
    val out = farm(Seq(
      ("a", "echo hello"),
      ("b", "printf '%s-%s' x y"),
      ("c", "echo $((6 * 7))"))).toMap
    assert(out == Map("a" -> "hello", "b" -> "x-y", "c" -> "42"))
  }

  test("fork-exec path: NUL-separated argv bypasses the shell (no expansion)") {
    // Through a shell, $HOME would expand; fork-exec must pass it verbatim.
    val nul = "\u0000"
    val out = farm(Seq(("k", s"echo${nul}$$HOME${nul}literal"))).toMap
    assert(out("k") == "$HOME literal")
  }

  test("input order is preserved even when later commands finish first") {
    val kvs = (0 until 8).map { i =>
      // earlier commands sleep longer — completion order is reversed
      (i.toString, s"sleep 0.${7 - i} && echo $i")
    }
    import spark.implicits._
    val out = CmdFarm.mapCommands(kvs.toDS.coalesce(1), maxConcurrent = 8)
      .collect().toSeq
    assert(out == (0 until 8).map(i => (i.toString, i.toString)))
  }

  test("a failing command yields its partial stdout and does not kill the farm") {
    val out = farm(Seq(
      ("ok", "echo fine"),
      ("bad", "echo partial && exit 3"),
      ("silent", "exit 1"))).toMap
    assert(out == Map("ok" -> "fine", "bad" -> "partial", "silent" -> ""))
  }

  test("cmd_farm gate query matches a driver-side replay") {
    val out = graft.SparkEntry.queries("cmd_farm")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = graft.Tables.load(spark, sfDir, "documents")
      .selectExpr("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 20 == 0).sortBy(_._1)
      .map { case (id, lang) => (id, s"$lang:${id * 3 + 7}") }
    assert(out.toSeq == expect.toSeq)
    assert(out.nonEmpty)
  }
}
