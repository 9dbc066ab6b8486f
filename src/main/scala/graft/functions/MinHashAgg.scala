package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature aggregate (TypedImperativeAggregate — the
  * mutable-buffer aggregate extension point the brief's ladder names for
  * sketches): folds per-shingle hash pairs (h1, h2) into a 64-wide
  * signature buffer with the universal permutation family
  * h_j = (h1 + j*h2) mod (2^31-1), one tight loop per input row.
  *
  * Replaces 64 parallel min() aggregate columns with ONE buffer update —
  * same map-side partial aggregation (update on mappers, merge after the
  * shuffle), same values bit-for-bit, so the LSH recall properties are
  * unchanged.
  *
  * Inputs must be the already-masked h1 ∈ [0, 2^31), h2 ∈ [1, 2^31) —
  * see Dedup.minhashPairs.
  */
case class MinHashAgg(
    h1: Expression,
    h2: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val Perms = 64
  private val P = 2147483647L // Mersenne prime 2^31 - 1

  override def children: Seq[Expression] = Seq(h1, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects (bigint, bigint), got (${h1.dataType}, ${h2.dataType})")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(Perms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    if (a != null && b != null) {
      val x1 = a.asInstanceOf[Long]
      val x2 = b.asInstanceOf[Long]
      var j = 0
      var h = x1 % P
      while (j < Perms) {
        if (h < buf(j)) buf(j) = h
        h += x2 // (h1 + (j+1)*h2) built incrementally, reduced mod P
        if (h >= P) h -= P
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < Perms) { if (b2(j) < b1(j)) b1(j) = b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Perms * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Perms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(h1 = newChildren(0), h2 = newChildren(1))
}

object MinHashAgg {
  /** Column-level entry point: `minhashSig($"h1", $"h2")`. */
  def minhashSig(h1: Column, h2: Column): Column =
    SqlShim.column(
      MinHashAgg(SqlShim.expression(h1), SqlShim.expression(h2))
        .toAggregateExpression())
}
