package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

/** Multimodal-column plumbing: treat media as opaque `binary` payloads
  * with typed extracted metadata. The container here is real BMP
  * (Windows bitmap: 14-byte file header + 40-byte BITMAPINFOHEADER,
  * little-endian fields) — a deterministic public format this
  * codec-less container can both synthesize and parse byte-for-byte —
  * so the decode step is genuine header parsing, not a stub. The
  * Spark-side shape is the pattern any codec UDF would use: binary
  * column in, per-partition batch processing with a reused native
  * resource (here a MessageDigest standing in for a decoder handle),
  * flat typed metadata schema out.
  */
object MultiModal {

  private val HeaderLen = 54 // 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER

  /** Serialize a minimal valid 8-bpp BMP: magic "BM", file size, pixel
    * offset at byte 10, width/height as little-endian int32 at bytes
    * 18/22, pixel bytes appended at the declared offset. */
  private[llm] def bmpEncode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(HeaderLen + pixels.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(HeaderLen + pixels.length) // file size
      .putInt(0)                         // reserved
      .putInt(HeaderLen)                 // pixel data offset
      .putInt(40)                        // BITMAPINFOHEADER size
      .putInt(width)
      .putInt(height)
      .putShort(1)                       // color planes
      .putShort(8)                       // bits per pixel
      .putInt(0)                         // compression (BI_RGB)
      .putInt(pixels.length)             // image size
      .putInt(2835).putInt(2835)         // 72 dpi resolutions
      .putInt(0).putInt(0)               // palette counts
      .put(pixels)
    buf.array()
  }

  /** Parse (width, height, pixelOffset) out of the actual header bytes;
    * throws on a payload that is not a BMP — a corrupt container must
    * fail loudly, not emit garbage dimensions. */
  private[llm] def bmpDecodeHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= HeaderLen && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      s"not a BMP payload (${bytes.length} bytes)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    (buf.getInt(18), buf.getInt(22), buf.getInt(10))
  }

  private val WavHeaderLen = 44 // canonical RIFF/WAVE PCM header

  /** Serialize a minimal valid 16-bit PCM WAV: RIFF/WAVE + "fmt " chunk
    * (format 1, little-endian rate/byte-rate/block-align) + "data"
    * chunk with the sample bytes appended. */
  private[llm] def wavEncode(rate: Int, channels: Int, samples: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * 2
    val buf = ByteBuffer.allocate(WavHeaderLen + samples.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + samples.length)            // RIFF chunk size
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII"))
      .putInt(16)                             // fmt chunk size
      .putShort(1)                            // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * blockAlign)              // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16)                           // bits per sample
      .put("data".getBytes("US-ASCII"))
      .putInt(samples.length)
      .put(samples)
    buf.array()
  }

  /** Parse (sampleRate, channels, bitsPerSample, dataLen) from the
    * actual header bytes; throws on a non-WAV payload. */
  private[llm] def wavDecodeHeader(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= WavHeaderLen &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      s"not a WAV payload (${bytes.length} bytes)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    (buf.getInt(24), buf.getShort(22).toInt, buf.getShort(34).toInt, buf.getInt(40))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("multimodal_meta", (s, d) => {
      import s.implicits._
      // SYNTHESIZE: wrap each document's bytes as the pixel data of a
      // real BMP whose dimensions derive from doc_id — the storage-side
      // stand-in for images this container has no codecs to produce.
      val files = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("px"))
        .as[(Long, Array[Byte])]
        .map { case (id, px) =>
          (id, bmpEncode((id % 1920L + 1L).toInt, (id * 7L % 1080L + 1L).toInt, px))
        }
      // DECODE: a separate pass that sees ONLY payload bytes — reads
      // width/height/pixel-offset from the real header fields and
      // checksums the pixel region the header points at. The oracle
      // recomputes the dimensions from doc_id and the checksum from the
      // raw document, so any synth/parse disagreement (wrong endianness,
      // off-by-one offsets) breaks the hash compare.
      files.mapPartitions { it =>
        // per-partition decoder setup, reused across the batch — the
        // slot where a real image/audio codec handle would live
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val (w, h, off) = bmpDecodeHeader(bytes)
          val checksum = md.digest(java.util.Arrays.copyOfRange(bytes, off, bytes.length))
            .map("%02x".format(_)).mkString
          (id, bytes.length.toLong, w.toLong, h.toLong, checksum)
        }
      }.toDF("doc_id", "n_bytes", "width", "height", "checksum")
        .orderBy("doc_id")
    }, Some(
      "SELECT doc_id, CAST(octet_length(encode(text)) + 54 AS BIGINT) AS n_bytes, " +
      "CAST(doc_id % 1920 + 1 AS BIGINT) AS width, " +
      "CAST(doc_id * 7 % 1080 + 1 AS BIGINT) AS height, " +
      "sha256(text) AS checksum FROM documents ORDER BY doc_id")),

    // ---- Audio metadata: the WAV (RIFF) sibling of multimodal_meta —
    // a second real public container, so the binary-column pattern is
    // demonstrated across modalities, not specialized to one header
    // layout. Synthesis derives format parameters from doc_id (sample
    // rate 8–24 kHz, 1–2 channels, 16-bit PCM) and wraps the document
    // bytes as sample data; decode reads rate/channels/bits/data-length
    // from the actual little-endian header fields, derives duration in
    // exact integer microseconds, and checksums the data region the
    // header locates. The oracle recomputes everything from doc_id and
    // the raw text — any synth/parse disagreement breaks the hash.
    QueryDef("multimodal_audio", (s, d) => {
      import s.implicits._
      val files = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("samples"))
        .as[(Long, Array[Byte])]
        .map { case (id, samples) =>
          (id, wavEncode((8000 + (id % 5L) * 4000L).toInt, (1 + id % 2L).toInt, samples))
        }
      files.mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val (rate, channels, bits, dataLen) = wavDecodeHeader(bytes)
          val durationUs = dataLen.toLong * 1000000L / (rate.toLong * channels * (bits / 8))
          val checksum = md.digest(java.util.Arrays.copyOfRange(bytes, WavHeaderLen, bytes.length))
            .map("%02x".format(_)).mkString
          (id, bytes.length.toLong, rate.toLong, channels.toLong, durationUs, checksum)
        }
      }.toDF("doc_id", "n_bytes", "sample_rate", "channels", "duration_us", "checksum")
        .orderBy("doc_id")
    }, Some(
      "SELECT doc_id, CAST(octet_length(encode(text)) + 44 AS BIGINT) AS n_bytes, " +
      "CAST(8000 + (doc_id % 5) * 4000 AS BIGINT) AS sample_rate, " +
      "CAST(1 + doc_id % 2 AS BIGINT) AS channels, " +
      "(CAST(octet_length(encode(text)) AS BIGINT) * 1000000) // " +
      "((8000 + (doc_id % 5) * 4000) * (1 + doc_id % 2) * 2) AS duration_us, " +
      "sha256(text) AS checksum FROM documents ORDER BY doc_id")),

    // ---- Frame sampling: treat the payload as a stream, cut fixed-size
    // "frames" at a stride (every 4th 64-byte window — the every-k-th-
    // frame video pattern), extract per-frame features. explode keeps it
    // one pass, no shuffle until the (tiny) per-frame feature rows.
    QueryDef("multimodal_frames", (s, d) => {
      val frameLen = 64
      val stride = 4 * frameLen
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
        .select(col("doc_id"),
          posexplode(expr(
            s"transform(sequence(0, CAST(greatest(0, (len - 1) DIV $stride) AS INT)), " +
            s"k -> substring(text, k * $stride + 1, $frameLen))")))
        .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
          length(col("col")).cast("long").as("frame_len"),
          sha2(col("col"), 256).as("frame_hash"))
        .orderBy("doc_id", "frame_idx")
    }, Some(
      "WITH ks AS (SELECT doc_id, text, " +
      "unnest(range(0, CAST(greatest(0, (len(text)-1)//256) AS BIGINT) + 1)) AS k FROM documents) " +
      "SELECT doc_id, CAST(k AS BIGINT) AS frame_idx, " +
      "CAST(len(substring(text, CAST(k*256+1 AS INT), 64)) AS BIGINT) AS frame_len, " +
      "sha256(substring(text, CAST(k*256+1 AS INT), 64)) AS frame_hash " +
      "FROM ks ORDER BY doc_id, frame_idx"))
  )
}
