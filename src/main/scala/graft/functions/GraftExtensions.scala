package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector: registers graft's native expressions
  * under SQL names so `spark.sql("SELECT dot_d(a, b) ...")` works in any
  * session built with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    val builder: Seq[Expression] => Expression = {
      case Seq(a, b) => DotProductD(a, b)
      case other =>
        throw new IllegalArgumentException(
          s"dot_d expects 2 arguments, got ${other.length}")
    }
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProductD].getName, "dot_d"),
      builder))
    // md5_prefix64(x) — the portable 60-bit dedup fingerprint
    val md5pBuilder: Seq[Expression] => Expression = {
      case Seq(c) => Md5Prefix64(c)
      case other =>
        throw new IllegalArgumentException(
          s"md5_prefix64 expects 1 argument, got ${other.length}")
    }
    ext.injectFunction((
      FunctionIdentifier("md5_prefix64"),
      new ExpressionInfo(classOf[Md5Prefix64].getName, "md5_prefix64"),
      md5pBuilder))
    // minhash_sig(h1, h2) and freq_items(item, k) — the native
    // aggregates, callable from SQL like any built-in
    val minhashBuilder: Seq[Expression] => Expression = {
      case Seq(a, b) => MinHashAgg(a, b).toAggregateExpression()
      case other =>
        throw new IllegalArgumentException(
          s"minhash_sig expects 2 arguments, got ${other.length}")
    }
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_sig"),
      minhashBuilder))
    // Shared positive-int-literal extractor for sketch parameters. The
    // null check catches foldable-NULL literals (CAST(NULL AS INT)) —
    // k <= 0 would otherwise build a sketch that can never admit an
    // item and silently returns empty. The Int.MaxValue check keeps the
    // promised IllegalArgumentException for over-2^31 literals (a
    // plausible bloom size) instead of a leaked NumberFormatException.
    def positiveIntLit(e: Expression, what: String): Int = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val integral = Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType)
      val raw = if (e.foldable && integral(e.dataType)) e.eval() else null
      val v = if (raw == null) -1L else raw.toString.toLong
      if (v > 0 && v <= Int.MaxValue) v.toInt
      else throw new IllegalArgumentException(
        s"$what must be a positive 32-bit integer literal, got " +
          (if (raw == null) "a non-literal or NULL" else raw.toString))
    }
    val freqBuilder: Seq[Expression] => Expression = {
      case Seq(item, k) =>
        FreqItemsAgg(item, positiveIntLit(k, "freq_items: k")).toAggregateExpression()
      case other =>
        throw new IllegalArgumentException(
          s"freq_items expects 2 arguments, got ${other.length}")
    }
    ext.injectFunction((
      FunctionIdentifier("freq_items"),
      new ExpressionInfo(classOf[FreqItemsAgg].getName, "freq_items"),
      freqBuilder))
    // bloom_agg(key, numBits, numHashes) — the Bloom build side; probe
    // with plain built-ins (see BloomAgg.mightContain)
    val bloomBuilder: Seq[Expression] => Expression = {
      case Seq(key, bits, hashes) =>
        BloomAgg(key, positiveIntLit(bits, "bloom_agg: numBits"),
          positiveIntLit(hashes, "bloom_agg: numHashes")).toAggregateExpression()
      case other =>
        throw new IllegalArgumentException(
          s"bloom_agg expects 3 arguments, got ${other.length}")
    }
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
      bloomBuilder))
    ext.injectPlannerStrategy(_ => graft.plans.StrideSampleStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushProjectBelowStrideSample)
  }
}
