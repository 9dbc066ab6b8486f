package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads
  * with typed extracted metadata. The decode step is a clearly-marked
  * deterministic STUB (this container has no image/audio codecs); the
  * Spark-side shape — binary column, typed Dataset, per-partition batch
  * processing with a reused native resource (here a MessageDigest), flat
  * metadata schema out — is the real pattern a codec UDF would use.
  */
object MultiModal {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("multimodal_meta", (s, d) => {
      import s.implicits._
      val bin = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      bin.mapPartitions { it =>
        // per-partition "decoder" setup, reused across the batch — the
        // slot where a real image/audio codec handle would live
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          // STUB decode: deterministic fake dimensions derived from the
          // payload (real codec would parse the container header)
          val width = n % 640L
          val height = (n * 31L) % 480L
          val checksum = md.digest(bytes).map("%02x".format(_)).mkString
          (id, n, width, height, checksum)
        }
      }.toDF("doc_id", "n_bytes", "width", "height", "checksum")
        .orderBy("doc_id")
    }, Some(
      "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
      "CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width, " +
      "CAST(octet_length(encode(text)) * 31 % 480 AS BIGINT) AS height, " +
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
