package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra-Gries heavy-hitters aggregate (TypedImperativeAggregate,
  * the same extension point as [[MinHashAgg]]): one pass, k counters,
  * fully mergeable — the frequent-items sketch a 100 TB vocabulary
  * profile runs where an exact groupBy would shuffle billions of
  * distinct keys. Reference anchor: the reference's sketch surface is
  * its sampling/statistics verbs (kmr_sample_kv and the histogram
  * family); frequency sketching is the standard scale-out companion
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS'12).
  *
  * Guarantees (classic MG): every item with true count > N/(k+1) is in
  * the sketch, and each reported count c satisfies
  * true - N/(k+1) <= c <= true. Counts are lower bounds, NOT exact —
  * the gate runs this rows-only (like the HLL/quantile sketches); the
  * spec pins the guarantee on adversarial data.
  *
  * update: hit +1; miss inserts if a slot is free, else decrements all
  * k counters and evicts zeros (O(k), but only on a miss-when-full, and
  * k is a small constant). merge: counter-wise sum, then subtract the
  * (k+1)-th largest value so at most k survive.
  */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"freq_items needs at least one counter, got k=$k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("min_count", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "freq_items"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_items expects a string column, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // decrement-all: drop every counter by 1, evicting zeros.
          // O(k) on a miss-when-full only; k is small and fixed.
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (item, c) =>
      b1.update(item, b1.getOrElse(item, 0L) + c)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count; ties broken by item so the
      // survivor set is a function of the counter multiset alone
      val cut = b1.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic presentation: (count desc, item asc)
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c))
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val payload = entries.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + payload.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(payload).foreach { case ((_, c), bytes) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren(0))
}

object FreqItemsAgg {
  /** Column-level entry point: `freqItems($"token", 256)`. */
  def freqItems(item: Column, k: Int): Column =
    SqlShim.column(
      FreqItemsAgg(SqlShim.expression(item), k).toAggregateExpression())
}
