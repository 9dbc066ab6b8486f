package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

import java.io.{BufferedOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.file.{Files, Path}

/** splicezip parity (reference tool/splicezip.c, ~1.6k LoC): concatenate
  * PK-ZIP files into one archive WITHOUT recompressing — the inputs'
  * bytes are copied verbatim (local records unmodified, old central
  * directories left behind as dead bytes, exactly like the reference),
  * and a NEW central directory is appended, collected from the inputs'
  * central directories with each entry's local-header offset shifted by
  * its input's base position. Always emits a zip64 tail (EOCD64 +
  * locator + EOCD — tool/splicezip.c:19,26-33); a shifted offset that
  * no longer fits 32 bits moves into a rebuilt 0x0001 zip64 extra field
  * in that entry, preserving any masked size values the original extra
  * carried. Duplicate names are kept (the reference does not dedup).
  *
  * Scale note: this is a FILE utility, faithful to the reference's
  * single-process CLI — it streams bytes (bounded buffers, no
  * whole-archive memory) but is deliberately not a distributed
  * operator; the distributed analogue of "combine archives cheaply" in
  * this engine is the parquet sink family (sink_compact). The gate
  * builds two deterministic archives from the `documents` table,
  * splices them, and emits the spliced archive's central directory
  * (entry name, uncompressed size) — which DuckDB replays from the
  * same rows, so the splice is value-oracled, and the spec round-trips
  * every entry's bytes through java.util.zip (CRC-checked streams). */
object ZipSplice {

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong) | (u16(b, o + 2).toLong << 16)
  private def u64(b: Array[Byte], o: Int): Long =
    u32(b, o) | (u32(b, o + 4) << 32)
  private def w16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def w32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)
  private def w64(v: Long): Array[Byte] =
    Array.tabulate(8)(i => ((v >> (8 * i)) & 0xff).toByte)

  private val CenSig = 0x02014b50L
  private val EocdSig = 0x06054b50L
  private val Eocd64Sig = 0x06064b50L
  private val LocatorSig = 0x07064b50L

  /** One parsed central-directory entry: the raw bytes (fixed header +
    * name + extra + comment) and its resolved local-header offset. */
  private[sources] final case class Cen(raw: Array[Byte], localOffset: Long)

  /** Parse an input archive's central directory. EOCD search is
    * bounded to the trailing 1 MB like the reference
    * (tool/splicezip.c:24); zip64 inputs resolve via EOCD64. */
  private def readCentral(p: Path): Vector[Cen] = {
    val raf = new RandomAccessFile(p.toFile, "r")
    try {
      val len = raf.length()
      val tail = math.min(len, (1 << 20).toLong + 22).toInt
      val buf = new Array[Byte](tail)
      raf.seek(len - tail); raf.readFully(buf)
      var e = -1
      var i = tail - 22
      while (i >= 0 && e < 0) {
        if (u32(buf, i) == EocdSig && 22 + u16(buf, i + 20) == tail - i) e = i
        i -= 1
      }
      require(e >= 0, s"$p: no end-of-central-directory record in last 1 MB")
      var nEntries: Long = u16(buf, e + 10).toLong
      var cdSize: Long = u32(buf, e + 12)
      var cdOff: Long = u32(buf, e + 16)
      if (nEntries == 0xffffL || cdSize == 0xffffffffL || cdOff == 0xffffffffL) {
        // zip64: the locator (20 B) immediately precedes the EOCD
        val locAt = (len - tail) + e - 20
        val loc = new Array[Byte](20)
        raf.seek(locAt); raf.readFully(loc)
        require(u32(loc, 0) == LocatorSig, s"$p: zip64 markers but no locator")
        val e64At = u64(loc, 8)
        val e64 = new Array[Byte](56)
        raf.seek(e64At); raf.readFully(e64)
        require(u32(e64, 0) == Eocd64Sig, s"$p: bad EOCD64")
        nEntries = u64(e64, 32); cdSize = u64(e64, 40); cdOff = u64(e64, 48)
      }
      val cd = new Array[Byte](cdSize.toInt)
      raf.seek(cdOff); raf.readFully(cd)
      var o = 0
      val out = Vector.newBuilder[Cen]
      var k = 0L
      while (k < nEntries) {
        require(u32(cd, o) == CenSig, s"$p: bad central entry at $o")
        val nameL = u16(cd, o + 28); val extraL = u16(cd, o + 30)
        val cmtL = u16(cd, o + 32)
        val total = 46 + nameL + extraL + cmtL
        val raw = java.util.Arrays.copyOfRange(cd, o, o + total)
        var off = u32(raw, 42)
        if (off == 0xffffffffL) {
          // resolve from the zip64 extra: fields appear in canonical
          // order for whichever header fields are masked
          var x = 46 + nameL
          val xEnd = 46 + nameL + extraL
          var found = false
          while (x + 4 <= xEnd && !found) {
            val id = u16(raw, x); val sz = u16(raw, x + 2)
            if (id == 1) {
              var q = x + 4
              if (u32(raw, 24) == 0xffffffffL) q += 8 // uncompressed
              if (u32(raw, 20) == 0xffffffffL) q += 8 // compressed
              off = u64(raw, q); found = true
            } else x += 4 + sz
          }
          require(found, s"$p: masked offset without zip64 extra")
        }
        out += Cen(raw, off)
        o += total; k += 1
      }
      out.result()
    } finally raf.close()
  }

  /** Re-encode one central entry with its local offset rebased to
    * `newOff`. Fast path: fits 32 bits and the original wasn't masked →
    * patch in place. Otherwise rebuild the extra field: strip any
    * existing 0x0001 block (preserving masked size values) and append
    * a fresh one carrying them plus the 64-bit offset. */
  private[sources] def rebase(c: Cen, newOff: Long): Array[Byte] = {
    val raw = c.raw
    val nameL = u16(raw, 28); val extraL = u16(raw, 30); val cmtL = u16(raw, 32)
    val usizeMasked = u32(raw, 24) == 0xffffffffL
    val csizeMasked = u32(raw, 20) == 0xffffffffL
    val offWasMasked = u32(raw, 42) == 0xffffffffL
    if (newOff <= 0xffffffffL && !offWasMasked && !usizeMasked && !csizeMasked) {
      val out = raw.clone()
      System.arraycopy(w32(newOff), 0, out, 42, 4)
      return out
    }
    // rebuild: fixed header + name + (extra minus old 0x0001) + new
    // 0x0001 + comment
    var masked = Vector.empty[Long] // preserved zip64 size values, in order
    val xs = Vector.newBuilder[Byte]
    var x = 46 + nameL
    val xEnd = 46 + nameL + extraL
    while (x + 4 <= xEnd) {
      val id = u16(raw, x); val sz = u16(raw, x + 2)
      if (id == 1) {
        var q = x + 4
        if (usizeMasked) { masked :+= u64(raw, q); q += 8 }
        if (csizeMasked) { masked :+= u64(raw, q); q += 8 }
      } else xs ++= java.util.Arrays.copyOfRange(raw, x, x + 4 + sz)
      x += 4 + sz
    }
    val offMasked = newOff > 0xffffffffL
    val payload = masked.flatMap(w64) ++ (if (offMasked) w64(newOff).toVector else Vector.empty)
    val z64 = w16(1) ++ w16(payload.length) ++ payload.toArray
    val keptExtra = xs.result().toArray
    val newExtra = keptExtra ++ (if (payload.nonEmpty) z64 else Array.empty[Byte])
    val out = new java.io.ByteArrayOutputStream()
    out.write(raw, 0, 30) // fixed header through extra-length's position
    out.write(w16(newExtra.length))
    out.write(raw, 32, 14) // comment len, disk, attrs (offset patched below)
    out.write(raw, 46, nameL)
    out.write(newExtra)
    out.write(raw, 46 + nameL + extraL, cmtL)
    val bytes = out.toByteArray
    System.arraycopy(w32(if (offMasked) 0xffffffffL else newOff), 0, bytes, 42, 4)
    bytes
  }

  /** Splice `inputs` into `out`; returns the total entry count. */
  def splice(inputs: Seq[Path], out: Path): Long = {
    require(inputs.nonEmpty, "splicezip: no inputs")
    val os = new BufferedOutputStream(new FileOutputStream(out.toFile))
    try {
      var base = 0L
      val entries = Vector.newBuilder[Array[Byte]]
      for (in <- inputs) {
        for (c <- readCentral(in)) entries += rebase(c, base + c.localOffset)
        Files.copy(in, os)
        base += Files.size(in)
      }
      val cd = entries.result()
      val cdStart = base
      var cdSize = 0L
      for (e <- cd) { os.write(e); cdSize += e.length }
      val n = cd.size.toLong
      // EOCD64 (the reference always writes the zip64 tail)
      os.write(w32(Eocd64Sig)); os.write(w64(44L))
      os.write(w16(45)); os.write(w16(45))
      os.write(w32(0L)); os.write(w32(0L))
      os.write(w64(n)); os.write(w64(n))
      os.write(w64(cdSize)); os.write(w64(cdStart))
      // locator
      os.write(w32(LocatorSig)); os.write(w32(0L))
      os.write(w64(cdStart + cdSize)); os.write(w32(1L))
      // EOCD — real values when they fit, masks otherwise
      os.write(w32(EocdSig)); os.write(w16(0)); os.write(w16(0))
      val n16 = if (n > 0xffffL) 0xffff else n.toInt
      os.write(w16(n16)); os.write(w16(n16))
      os.write(w32(if (cdSize > 0xffffffffL) 0xffffffffL else cdSize))
      os.write(w32(if (cdStart > 0xffffffffL) 0xffffffffL else cdStart))
      os.write(w16(0))
      n
    } finally os.close()
  }

  /** Deterministic archive from documents rows [lo, hi): entry
    * `doc_<id>` holds the text's UTF-8 bytes, DEFLATE-compressed. */
  private[sources] def buildZip(rows: Seq[(Long, String)], p: Path): Unit = {
    val z = new java.util.zip.ZipOutputStream(new FileOutputStream(p.toFile))
    try rows.foreach { case (id, text) =>
      z.putNextEntry(new java.util.zip.ZipEntry(s"doc_$id"))
      z.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      z.closeEntry()
    } finally z.close()
  }

  def defs: Seq[QueryDef] = Seq(
    // ---- splicezip parity gate: two archives built from documents
    // rows 0-9 / 10-19, spliced without recompression, the result's
    // central directory emitted as (entry, n_bytes). The oracle
    // recomputes both columns from the same rows (strlen = UTF-8
    // bytes), so a wrong offset patch, a lost entry, or a corrupted
    // directory surfaces as a value mismatch; ZipSpliceSpec
    // additionally round-trips every entry's BYTES through
    // java.util.zip's CRC-checked streams and a zip64-offset fixture.
    QueryDef("zip_splice", (s, d) => {
      import s.implicits._
      val rows = Tables.load(s, d, "documents")
        .filter(col("doc_id") < 20 && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val dir = Files.createTempDirectory("zipsplice")
      val (a, b) = (dir.resolve("a.zip"), dir.resolve("b.zip"))
      buildZip(rows.filter(_._1 < 10).toSeq, a)
      buildZip(rows.filter(_._1 >= 10).toSeq, b)
      val out = dir.resolve("spliced.zip")
      splice(Seq(a, b), out)
      val zf = new java.util.zip.ZipFile(out.toFile)
      val entries =
        try {
          val it = zf.entries()
          val buf = Vector.newBuilder[(String, Long)]
          while (it.hasMoreElements) {
            val e = it.nextElement()
            buf += ((e.getName, e.getSize))
          }
          buf.result()
        } finally zf.close()
      entries.toDF("entry", "n_bytes").orderBy("entry")
    }, Some(
      """SELECT 'doc_' || doc_id AS entry, CAST(strlen(text) AS BIGINT) AS n_bytes
         FROM documents WHERE doc_id < 20 AND text IS NOT NULL
         ORDER BY entry""")),
  )
}
