package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlShim
import org.apache.spark.sql.types._

/** Native Bloom-filter aggregate (TypedImperativeAggregate, the same
  * extension point as [[MinHashAgg]]/[[FreqItemsAgg]]): one pass over the
  * build side's keys produces a fixed-size bit array, fully mergeable
  * across partitions (bitwise OR), that the probe side tests with PLAIN
  * BUILT-IN expressions — `xxhash64`/`pmod`/`element_at`/`shiftright` —
  * so the membership test runs inside whole-stage codegen with no custom
  * scalar expression at all.
  *
  * This is the semi-join-reduction sketch: at 100 TB the dominant cost of
  * a selective fact⋈dim join is shuffling the fact side, and a Bloom
  * filter built from the dim keys and broadcast to the fact scan drops
  * (1 − FPR) of the non-matching rows BEFORE the shuffle. False positives
  * are removed by the exact join that follows, so the composed operator
  * is exact — the gate hash-compares it against a plain SQL join.
  * (Spark's own runtime row-level filtering plants the same shape behind
  * a conf; building it explicitly makes the technique available inside
  * any composition, on any join type, at a chosen size/FPR.)
  *
  * Reference anchor: the reference's join kernel is kmr_match
  * (kmrmoreops.c) — an exact shuffle-side equality matcher; the Bloom
  * prefilter is the standard scale-out companion for selective matches
  * (Bloom 1970; "performance-join" literature throughout).
  *
  * Hash contract (the load-bearing part): bit i of key K is
  * `pmod(xxhash64(K, i), numBits)` where `xxhash64(a, b)` is Spark's
  * built-in multi-arg fold — `hash(b, seed = hash(a, seed = 42))`. The
  * aggregate replays that fold via [[XxHash64Function]], so build and
  * probe agree bit-for-bit by construction (BloomSpec pins it).
  *
  * Sizing: numBits = 1<<20 (128 KiB — broadcast-trivial) at k = 5 gives
  * FPR ≈ 2e-4 at 30k keys, ≈ 1% at 170k. At real scale size numBits to
  * the build-side cardinality (m ≈ 14·n for 1e-3); the parameters are
  * explicit arguments, not baked in.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0,
    s"bloom_agg: numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"bloom_agg: numHashes must be positive, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a BIGINT key column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // replay the built-in xxhash64(key, i) fold: seed 42, then each
      // argument folds the running hash as the next seed
      val h0 = XxHash64Function.hash(v, LongType, 42L)
      var i = 0
      while (i < numHashes) {
        val hi = XxHash64Function.hash(i, IntegerType, h0)
        val pos = java.lang.Math.floorMod(hi, numBits.toLong).toInt
        buf(pos >>> 6) |= (1L << (pos & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren(0))
}

object BloomAgg {
  /** Column-level entry point: `bloomAgg($"o_orderkey", 1 << 20, 5)`. */
  def bloomAgg(key: Column, numBits: Int, numHashes: Int): Column =
    SqlShim.column(
      BloomAgg(SqlShim.expression(key), numBits, numHashes).toAggregateExpression())

  /** The matching probe predicate over a bloom ARRAY<BIGINT> column —
    * pure built-ins (xxhash64/pmod/element_at/shiftright), so it stays
    * inside whole-stage codegen. True ⇒ maybe-member (test ALL k bits);
    * false ⇒ definitely absent.
    *
    * NOTE: each conjunct interpolates the position expression twice
    * (word index + bit index) and FilterExec codegen does no cross-
    * conjunct subexpression elimination, so this form hashes 2k times
    * per row — fine for specs and small probes; the fact-scan hot path
    * should go through [[prefilter]], which binds each position once. */
  def mightContain(bloomCol: String, keyCol: String, numBits: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.functions.expr
    (0 until numHashes).map { i =>
      expr(
        s"(shiftright(element_at($bloomCol, cast(pmod(xxhash64($keyCol, $i), $numBits) div 64 AS INT) + 1), " +
        s"cast(pmod(xxhash64($keyCol, $i), $numBits) % 64 AS INT)) & 1) = 1")
    }.reduce(_ && _)
  }

  /** Hot-path Bloom prefilter: materialize the k bit positions in ONE
    * projection (each xxhash64 evaluated exactly once per row), test
    * the bits, drop the scratch columns. Project and Filter fuse in
    * whole-stage codegen, so this is a single pass with k hashes per
    * row — half the work of filtering on [[mightContain]] directly.
    * Returns `df` minus the definitely-absent rows (and the bloom
    * column untouched for the caller to drop). */
  def prefilter(df: org.apache.spark.sql.DataFrame, bloomCol: String,
      keyCol: String, numBits: Int, numHashes: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val posCols = (0 until numHashes).map(i =>
      expr(s"pmod(xxhash64($keyCol, $i), $numBits)").as(s"_bloom_pos$i"))
    val pred = (0 until numHashes).map { i =>
      expr(s"(shiftright(element_at($bloomCol, cast(_bloom_pos$i div 64 AS INT) + 1), " +
        s"cast(_bloom_pos$i % 64 AS INT)) & 1) = 1")
    }.reduce(_ && _)
    df.select(df.columns.map(col).toIndexedSeq ++ posCols: _*)
      .filter(pred)
      .drop((0 until numHashes).map(i => s"_bloom_pos$i"): _*)
  }
}
