package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprinter: the whole per-document winnow
  * pipeline — 32-char grams, 60-bit md5-prefix hash per gram
  * ([[Md5Prefix64]] math, so DuckDB replays it from its own md5),
  * sliding min over every 16-gram window, distinct — in ONE scan-stage
  * expression returning `array<bigint>`.
  *
  * Numerically IDENTICAL to the declarative formulation it replaces
  * (posexplode the gram hashes, per-doc window `min over rows [0,15]`,
  * filter to full windows, distinct): any common substring of
  * >= 32+16-1 = 47 chars still shares a fingerprint, and the value of
  * each fingerprint is unchanged — only the PLAN differs. The window
  * formulation shuffles every gram hash (doc_len − 31 longs per doc;
  * 68 MB shuffle-read at sf0.1, the census's largest) through an
  * Exchange(doc_id) just to group a document's own grams back
  * together — data that was already co-located in the scanned row.
  * Computing the fps inside the projection removes that shuffle
  * entirely: only the distinct (doc_id, fp) pairs leave the scan
  * stage, and the sliding min is a monotonic deque — O(grams) total,
  * not O(grams × 16). At 100 TB this is the difference between
  * shuffling ~8 bytes per document CHARACTER and shuffling ~8 bytes
  * per surviving fingerprint (~1/16 of grams before distinct).
  *
  * Stays inside whole-stage codegen via [[doGenCode]] — one static
  * call per row, same pattern as [[Md5Prefix64]].
  *
  * Reference semantics: winnowing per Schleimer/Wilkerson/Aiken 2003
  * (SIGMOD) — the local-min variant where ties keep every minimum
  * (min-over-window set semantics, exactly what the SQL `min` window
  * computed).
  */
case class WinnowFps(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects a string column, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFps.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  private val Gram = 32   // gram width (chars)
  private val Win = 16    // winnow window (grams); guarantee = 32+16-1 = 47

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Distinct winnowed fingerprints of one document, sorted ascending
    * (set semantics; callers aggregate, never index). Empty array for
    * texts shorter than the 47-char guarantee span. */
  def compute(text: UTF8String): ArrayData = {
    val nChars = text.numChars()
    if (nChars < Gram + Win - 1) return new GenericArrayData(Array.emptyLongArray)
    val nGrams = nChars - (Gram - 1)
    val h = new Array[Long](nGrams)
    val digest = md.get()
    val bytes = text.getBytes
    if (bytes.length == nChars) {
      // ASCII fast path: chars == bytes, hash each 32-byte slice in place
      var i = 0
      while (i < nGrams) {
        digest.reset()
        digest.update(bytes, i, Gram)
        h(i) = fold60(digest.digest())
        i += 1
      }
    } else {
      // multibyte: substring by CHARACTER (Spark substring / DuckDB
      // substr semantics), then hash its UTF-8 bytes
      var i = 0
      while (i < nGrams) {
        digest.reset()
        h(i) = fold60(digest.digest(text.substring(i, i + Gram).getBytes))
        i += 1
      }
    }
    // sliding min over [j, j+Win-1] for j in 0..nGrams-Win via a
    // monotonic ascending deque of candidate indices
    val nWin = nGrams - (Win - 1)
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail)
    val mins = new Array[Long](nWin)
    var i = 0
    while (i < nGrams) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      val j = i - (Win - 1) // window starting at j just completed
      if (j >= 0) {
        if (deque(head) < j) head += 1
        mins(j) = h(deque(head))
      }
      i += 1
    }
    java.util.Arrays.sort(mins)
    var k = 0
    var m = 0
    while (m < nWin) { // in-place dedup of the sorted mins
      if (k == 0 || mins(m) != mins(k - 1)) { mins(k) = mins(m); k += 1 }
      m += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, k))
  }

  /** First 60 bits of the digest as a non-negative long — identical
    * fold to [[Md5Prefix64.prefix64]]. */
  private def fold60(dig: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) & 0xf0L) >>> 4)
  }

  /** Column-level entry point: `winnow($"text")`. */
  def winnow(c: Column): Column =
    SqlShim.column(WinnowFps(SqlShim.expression(c)))
}
