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
    val freqBuilder: Seq[Expression] => Expression = {
      case Seq(item, k) =>
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        val integral = Set[org.apache.spark.sql.types.DataType](
          ByteType, ShortType, IntegerType, LongType)
        val kRaw = if (k.foldable && integral(k.dataType)) k.eval() else null
        // the null check catches foldable-NULL literals (CAST(NULL AS
        // INT)); k <= 0 would otherwise build a sketch that can never
        // admit an item and silently returns empty
        val kv =
          if (kRaw != null && kRaw.toString.toLong > 0) kRaw.toString.toInt
          else throw new IllegalArgumentException(
            "freq_items: k must be a positive integer literal")
        FreqItemsAgg(item, kv).toAggregateExpression()
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
        def intLit(e: Expression, what: String): Int = {
          import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
          val integral = Set[org.apache.spark.sql.types.DataType](
            ByteType, ShortType, IntegerType, LongType)
          val raw = if (e.foldable && integral(e.dataType)) e.eval() else null
          if (raw != null && raw.toString.toLong > 0) raw.toString.toInt
          else throw new IllegalArgumentException(
            s"bloom_agg: $what must be a positive integer literal")
        }
        BloomAgg(key, intLit(bits, "numBits"), intLit(hashes, "numHashes"))
          .toAggregateExpression()
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
