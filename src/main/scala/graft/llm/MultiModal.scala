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
      "sha256(text) AS checksum FROM documents ORDER BY doc_id"))
  )
}
