package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE text normalization used by every text operator and its DuckDB
  * oracle. The Spark expression and the SQL string must stay semantically
  * byte-for-byte equivalent — they live here as one pair so a tweak can
  * never land on one side only (the hash gate would silently desync). */
object TextNorm {
  /** Normalized whitespace-token array of `text`. */
  val toks: Column = split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")
  /** DuckDB mirror of [[toks]]. */
  val normSql: String = "string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' ')"
}
