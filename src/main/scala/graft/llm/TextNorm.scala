package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE text normalization used by every text operator and its DuckDB
  * oracle. The Spark expression and the SQL string must stay semantically
  * byte-for-byte equivalent — they live here as one pair so a tweak can
  * never land on one side only (the hash gate would silently desync). */
object TextNorm {
  /** Normalized text: lowercased, whitespace runs collapsed, trimmed. */
  val normText: Column = trim(regexp_replace(lower(col("text")), "\\s+", " "))
  /** DuckDB mirror of [[normText]]. */
  val normTextSql: String = "trim(regexp_replace(lower(text),'\\s+',' ','g'))"
  /** Normalized whitespace-token array of `text`. */
  val toks: Column = split(normText, " ")
  /** DuckDB mirror of [[toks]]. */
  val normSql: String = s"string_split($normTextSql, ' ')"
  /** THE content hash for exact/incremental dedup: sha256 of the
    * normalized text. One pair, used by every dedup variant. */
  val contentHash: Column = sha2(normText, 256)
  /** DuckDB mirror of [[contentHash]]. */
  val contentHashSql: String = s"sha256($normTextSql)"
}
