package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** kmr_assign_file (src/kmriolb.c:247-447) — locality invariant,
  * per-host leveling, the no-rank-host fallback, the real-FS block
  * probe, and the preferred-location scheduler hook. */
class LocalitySpec extends SparkSuite {

  private def syntheticFiles(n: Int, hosts: Int) = {
    import spark.implicits._
    (0 until n).map(i =>
      (f"file$i%03d", (1000 - i).toLong * 7, i % hosts))
      .toDF("file", "size", "host_idx")
  }

  test("every file lands on a rank of its own host (rank ≡ host mod H) " +
      "and per-host rank loads are level") {
    val assigned = Locality.assignByHost(syntheticFiles(97, 5), nRanks = 20, nHosts = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(assigned.length == 97)
    assigned.foreach { case (f, host, rank) =>
      assert(rank % 5 == host, s"$f: rank $rank not on host $host")
      assert(rank >= 0 && rank < 20)
    }
    // round-robin ⇒ within each host, rank counts differ by at most 1
    assigned.groupBy(_._2).foreach { case (host, fs) =>
      val byRank = fs.groupBy(_._3).map(_._2.length)
      assert(byRank.max - byRank.min <= 1,
        s"host $host: uneven loads ${byRank.toSeq.sorted}")
    }
  }

  test("largest files are dealt first (size-desc round-robin levels " +
      "bytes, not just counts)") {
    import spark.implicits._
    // one host, 2 ranks, sizes 100,90,...,10 → ranks alternate
    val files = (0 until 10).map(i => (s"f$i", (100 - i * 10).toLong, 0))
      .toDF("file", "size", "host_idx")
    val a = Locality.assignByHost(files, nRanks = 2, nHosts = 1)
      .orderBy(desc("size") /* deal order */).collect()
      // recover size ordering via file name: f0 largest
    val ranksInDealOrder = a.sortBy(r => r.getString(0).drop(1).toInt).map(_.getInt(2))
    assert(ranksInDealOrder.toSeq == Seq(0, 1, 0, 1, 0, 1, 0, 1, 0, 1))
  }

  test("a host beyond the rank ring falls back to the global ring " +
      "deterministically") {
    // 3 hosts but only 2 ranks: host 2 has no rank of its own
    val a1 = Locality.assignByHost(syntheticFiles(30, 3), nRanks = 2, nHosts = 3).collect()
    val a2 = Locality.assignByHost(syntheticFiles(30, 3), nRanks = 2, nHosts = 3).collect()
    assert(a1.map(_.toString).sorted.toSeq == a2.map(_.toString).sorted.toSeq,
      "fallback must be deterministic")
    a1.foreach { r =>
      val rank = r.getInt(2)
      assert(rank >= 0 && rank < 2, s"fallback rank $rank outside the ring")
    }
    assert(a1.exists(_.getInt(1) == 2), "host 2 files present")
  }

  test("fileBlockHosts probes real block locations (local FS reports " +
      "a host) with true sizes") {
    val locs = Locality.fileBlockHosts(spark, s"$sfDir/lineitem.parquet")
    assert(locs.nonEmpty)
    locs.foreach { l =>
      assert(l.size > 0, s"${l.file}: zero size")
      assert(l.hosts.nonEmpty, s"${l.file}: no block hosts")
    }
  }

  test("AssignedFilesRDD prefers each rank's host and reads every line " +
      "exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-loc").toFile
    try {
      val expected = (0 until 6).flatMap { i =>
        val f = new java.io.File(dir, s"part$i.txt")
        val lines = (0 until 10).map(j => s"f$i-l$j")
        java.nio.file.Files.write(f.toPath,
          String.join("\n", lines: _*).getBytes("UTF-8"))
        lines
      }
      val rdd = Locality.readAssigned(spark, dir.getAbsolutePath, nRanks = 4)
      assert(rdd.getNumPartitions == 4)
      // the scheduler hook: every partition prefers its assigned host
      (0 until 4).foreach { i =>
        val prefs = rdd.preferredLocations(rdd.partitions(i))
        assert(prefs.size <= 1)
      }
      val got = rdd.collect().sorted
      assert(got.toSeq == expected.sorted, "every line exactly once")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
