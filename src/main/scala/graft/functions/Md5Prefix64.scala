package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5-prefix hash: numerically IDENTICAL to
  * `cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)` — the
  * engine-portable fingerprint the dedup family shuffles (DuckDB
  * computes the same value from its own md5) — but computed straight
  * from the digest bytes. The conv-chain form materializes a 32-char
  * hex string per call and re-parses 15 characters of it; at ~1.35M
  * winnowing grams (dedup_substring, sf0.1) plus two md5s per shingle
  * (MinHash h1/h2) that allocation sits squarely on the dedup hot
  * path. This expression folds digest bytes 0..6 plus the high nibble
  * of byte 7 into the long directly — zero intermediate strings — and
  * participates in whole-stage codegen via [[doGenCode]].
  *
  * Value layout: 15 hex chars = 15 big-endian nibbles = bytes 0..6
  * (14 nibbles) then the high nibble of byte 7 — always non-negative
  * (fits in 60 bits).
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 expects a string or binary column, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => Md5Prefix64.prefix64(s.getBytes)
    case b: Array[Byte] => Md5Prefix64.prefix64(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytes = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _          => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Prefix64.prefix64(${bytes(c)});")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

object Md5Prefix64 {

  // MessageDigest is stateful: one instance per task thread, reset per call.
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long (see class doc). */
  def prefix64(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) & 0xf0L) >>> 4)
  }

  /** Column-level entry point: `md5p64($"gram")`. */
  def md5p64(c: Column): Column =
    SqlShim.column(Md5Prefix64(SqlShim.expression(c)))
}
