package graft.core

import graft.SparkSuite
import org.apache.spark.SparkException

/** KVS.mapBarrier — the gang-scheduled external-process step
  * (kmr_map_via_spawn / kmr_map_processes analogue). No SQL oracle is
  * possible for external processes; like CmdFarmSpec, the proof is that
  * the commands genuinely executed, saw their gang coordinates, and
  * their stdout round-tripped. local[4] caps the gang width at 4 slots,
  * so suites use width 2. */
class BarrierMapSpec extends SparkSuite {
  import spark.implicits._

  private def kvs(n: Int, parts: Int): KVS[String, String] =
    KVS(spark.createDataset((0 until n).map(i => (s"k$i", s"v$i"))).repartition(parts))

  test("pipes each partition through one process with gang coordinates in env") {
    // Each gang member tags every value with its rank and the gang size
    // it observed — proving per-process env injection, not a shared one.
    val out = kvs(12, 2).mapBarrier(Seq("sh", "-c",
      """while IFS="$(printf '\t')" read -r k v; do
        |  printf '%s\t%s:r%s/s%s\n' "$k" "$v" "$GRAFT_BARRIER_RANK" "$GRAFT_BARRIER_SIZE"
        |done""".stripMargin)).ds.collect().toMap
    assert(out.size == 12)
    val tagged = out.map { case (k, v) =>
      val Array(orig, gang) = v.split(":", 2)
      val Array(r, s) = gang.split("/")
      assert(orig == "v" + k.drop(1), s"stdout did not round-trip for $k")
      assert(s == "s2", s"gang size wrong: $gang")
      r
    }
    assert(tagged.toSet.subsetOf(Set("r0", "r1")), s"bad ranks: ${tagged.toSet}")
    assert(tagged.toSet.size == 2, "both gang members must have processed data")
  }

  test("GRAFT_BARRIER_ADDRS lists one address per gang member, rank-ordered") {
    val out = kvs(4, 2).mapBarrier(Seq("sh", "-c",
      // one line per process: its rank and how many peer addresses it sees
      """n=$(printf '%s' "$GRAFT_BARRIER_ADDRS" | tr ',' '\n' | grep -c .)
        |printf 'rank%s\t%s\n' "$GRAFT_BARRIER_RANK" "$n"
        |cat > /dev/null""".stripMargin)).ds.collect().toMap
    assert(out == Map("rank0" -> "2", "rank1" -> "2"), s"got $out")
  }

  test("a nonzero exit fails the stage loudly instead of emitting partial output") {
    val ex = intercept[SparkException] {
      kvs(4, 2).mapBarrier(Seq("sh", "-c", "cat > /dev/null; exit 3")).ds.collect()
    }
    assert(ex.getMessage.contains("exited 3") ||
      Option(ex.getCause).exists(_.getMessage.contains("exited 3")),
      s"unexpected failure: ${ex.getMessage}")
  }

  test("lines without a tab come back as bare keys with empty values") {
    val out = kvs(2, 1).mapBarrier(Seq("sh", "-c",
      "cat > /dev/null; echo solo")).ds.collect()
    assert(out.toSeq == Seq(("solo", "")))
  }
}
