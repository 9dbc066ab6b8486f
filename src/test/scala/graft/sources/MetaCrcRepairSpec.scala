package graft.sources

import graft.SparkSuite

/** writeMeta's crc-collision retry + repair (r14 fix, r15 hardening):
  * whatever path a publish takes — clean rename, collision retry, or
  * retry + re-land repair — the postcondition is the same: the pointer
  * holds the publisher's bytes, parses, and is readable through the
  * CHECKSUMMED FileSystem API (i.e. any regenerated `.crc` sibling is
  * consistent with the data; a stale crc would fail the read). The
  * collision is forced by planting a fresh destination crc the way a
  * concurrent publisher's commit leaves one. */
class MetaCrcRepairSpec extends SparkSuite {

  private def hfs(root: org.apache.hadoop.fs.Path) =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readThroughChecksum(root: org.apache.hadoop.fs.Path): String = {
    val fs = hfs(root) // LocalFileSystem = ChecksumFileSystem: verifies .crc
    val in = fs.open(new org.apache.hadoop.fs.Path(root, "_graft_meta"))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("sequential publishes keep the pointer checksum-consistent") {
    val dir = java.nio.file.Files.createTempDirectory("meta_crc").toString
    val root = new org.apache.hadoop.fs.Path(new java.io.File(dir).toURI)
    val fs = hfs(root)
    ServedIndex.writeMeta(spark, fs, root, "v1", "", "fp1")
    assert(readThroughChecksum(root) == "v1\n\nfp1")
    ServedIndex.writeMeta(spark, fs, root, "v2", "v1", "fp2")
    assert(readThroughChecksum(root) == "v2\nv1\nfp2")
    assert(ServedIndex.readMeta(fs, root).contains(("v2", "v1", "fp2")))
  }

  test("a planted destination crc (concurrent publisher's residue) still " +
      "yields our bytes, parseable, checksum-readable") {
    val dir = java.nio.file.Files.createTempDirectory("meta_crc2").toString
    val root = new org.apache.hadoop.fs.Path(new java.io.File(dir).toURI)
    val fs = hfs(root)
    ServedIndex.writeMeta(spark, fs, root, "v1", "", "fp1")
    // plant: a DIFFERENT content's crc at the destination sibling — the
    // state a racing publisher leaves when its commit wins a moment
    // before ours renames
    val crc = new org.apache.hadoop.fs.Path(root, "._graft_meta.crc")
    fs.delete(crc, false)
    val raw = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration).getRaw
    val o = raw.create(crc, true)
    try o.write("planted-bogus-crc".getBytes("UTF-8")) finally o.close()
    ServedIndex.writeMeta(spark, fs, root, "v3", "v1", "fp3")
    assert(ServedIndex.readMeta(fs, root).contains(("v3", "v1", "fp3")))
    // the repair (or the clean path, if this Hadoop build's rename
    // tolerates the collision) must leave the checksummed read working:
    // a stale or bogus crc surviving next to fresh data would throw here
    assert(readThroughChecksum(root) == "v3\nv1\nfp3")
  }
}
