package graft.core

import graft.SparkSuite

/** Operator-property suite mirroring the reference's test0.c:138-330 and
  * test1.c invariants: count conservation, sortedness, co-location,
  * join multiplicity, ranking contiguity, scan == sequential fold. */
class KVSSpec extends SparkSuite {

  private def kvs(pairs: (String, Long)*): KVS[String, Long] = {
    import spark.implicits._
    KVS.generate(spark, pairs, numPartitions = 3)
  }

  // The 5 hand pairs of test0.c plus duplicates for grouping.
  private def sample = kvs(
    ("apple", 1L), ("banana", 2L), ("cherry", 3L), ("apple", 4L),
    ("banana", 5L), ("apple", 6L), ("date", 7L))

  test("map preserves count; flatMap multiplies it") {
    import spark.implicits._
    assert(sample.map { case (k, v) => (k, v * 2) }.elementCount() == 7)
    assert(sample.flatMap { case (k, v) => Seq((k, v), (k, -v)) }.elementCount() == 14)
    assert(sample.flatMap { case _ => Nil: Seq[(String, Long)] }.elementCount() == 0)
  }

  test("shuffle conserves the multiset and co-locates equal keys") {
    val shuffled = sample.shuffle(3)
    assert(shuffled.ds.collect().sorted.toSeq == sample.ds.collect().sorted.toSeq)
    // each key appears in exactly one partition
    val perPart = shuffled.ds.rdd
      .mapPartitionsWithIndex((i, it) => it.map(kv => (kv._1, i)))
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    assert(perPart.values.forall(_ == 1))
  }

  test("replicate returns every pair (allgather)") {
    assert(sample.replicate().value.sorted.toSeq == sample.ds.collect().sorted.toSeq)
  }

  test("reduce sees whole groups; group sizes = key frequencies") {
    import spark.implicits._
    val sizes = sample.reduce[String, Long]((k, vs) => Seq((k, vs.size.toLong)))
      .ds.collect().toMap
    assert(sizes == Map("apple" -> 3L, "banana" -> 2L, "cherry" -> 1L, "date" -> 1L))
  }

  test("reduceByKey sums match sequential fold") {
    import spark.implicits._
    val sums = sample.reduceByKey(_ + _).ds.collect().toMap
    assert(sums == Map("apple" -> 11L, "banana" -> 7L, "cherry" -> 3L, "date" -> 7L))
  }

  test("sort: globally ordered, count conserved (kmr_assert_sorted parity)") {
    import spark.implicits._
    val sorted = sample.sort().ds.collect()
    assert(sorted.length == 7)
    assert(sorted.map(_._1).toSeq == sorted.map(_._1).sorted.toSeq)
  }

  test("sortLocally: each partition ordered, no shuffle of elements") {
    val parts = sample.sortLocally().ds.rdd.glom().collect()
    parts.foreach { p =>
      assert(p.map(_._1).toSeq == p.map(_._1).sorted.toSeq)
    }
    assert(parts.map(_.length).sum == 7)
  }

  test("concatenate is bag union") {
    assert(sample.concatenate(sample, sample).elementCount() == 21)
  }

  test("matchJoin multiplicity = product of per-key frequencies") {
    import spark.implicits._
    val other = kvs(("apple", 10L), ("apple", 20L), ("date", 30L), ("elder", 40L))
    val joined = sample.matchJoin(other).ds.collect()
    // apple: 3*2=6, date: 1*1=1, others: 0
    assert(joined.length == 7)
    assert(joined.count(_._1 == "apple") == 6)
    assert(joined.count(_._1 == "date") == 1)
  }

  test("ranking is a contiguous 0..n-1 permutation in global order") {
    import spark.implicits._
    val ranked = sample.sort().ranking.ds.collect().sortBy(_._1)
    assert(ranked.map(_._1).toSeq == (0L until 7L))
    // rank order agrees with the sorted key order
    assert(ranked.map(_._2._1).toSeq == sample.ds.collect().map(_._1).sorted.toSeq)
  }

  test("distribute balances partition sizes within 1 (kmr_distribute)") {
    import spark.implicits._
    val big = KVS.generate(spark, (1L to 1000L).map(i => (i, i)), 2)
    val sizes = big.distribute(8).histogramByPartition().map(_._2)
    assert(sizes.sum == 1000L)
    // round-robin is ±1 per input partition; 2 inputs → spread ≤ 2
    assert(sizes.max - sizes.min <= 2,
      s"uneven after distribute: ${sizes.mkString(",")}")
  }

  test("scanOnValues == sequential non-inclusive fold; total matches") {
    import spark.implicits._
    val n = 100L
    val src = KVS.generate(spark, (1L to n).map(i => (i, i)), 5)
    val inOrder = new KVS(src.ds.orderBy("_1"))
    val scanned = inOrder.scanOnValues(0L)(_ + _).ds.collect().sortBy(_._1)
    scanned.foreach { case (k, pre) =>
      assert(pre == (k - 1) * k / 2, s"prefix at $k")
    }
    assert(src.totalOnValues(0L)(_ + _) == n * (n + 1) / 2)
  }

  test("chooseFirstPart keeps the global-order head") {
    import spark.implicits._
    val first3 = sample.sort().chooseFirstPart(3).ds.collect().map(_._1).toSeq
    assert(first3 == Seq("apple", "apple", "apple"))
  }

  test("countKeys matches key frequencies") {
    import spark.implicits._
    assert(sample.countKeys().ds.collect().toMap ==
      Map("apple" -> 3L, "banana" -> 2L, "cherry" -> 1L, "date" -> 1L))
  }

  test("reverse and pairing round-trip") {
    import spark.implicits._
    val rev = sample.reverse.ds.collect().sorted.toSeq
    assert(rev == sample.ds.collect().map(kv => (kv._2, kv._1)).sorted.toSeq)
    val paired = sample.pairing.ds.collect()
    paired.foreach { case (k, (k2, _)) => assert(k == k2) }
    assert(paired.length == 7)
  }

  test("findKey: exactly-one semantics (errors on absent and ambiguous)") {
    assert(sample.findKey("cherry") == 3L)
    intercept[IllegalArgumentException](sample.findKey("nope"))
    intercept[IllegalArgumentException](sample.findKey("apple"))
  }

  test("takeOne: single element or error") {
    import spark.implicits._
    assert(KVS.generate(spark, Seq(("x", 9L))).takeOne() == ("x", 9L))
    intercept[IllegalArgumentException](sample.takeOne())
  }

  test("sampleStride picks every stride-th element of the global order") {
    import spark.implicits._
    val src = new KVS(KVS.generate(spark, (0L until 100L).map(i => (i, i)), 4).ds.orderBy("_1"))
    val picked = src.sampleStride(2, 10).ds.collect().map(_._1).sorted.toSeq
    assert(picked == (2L until 100L by 10L).toSeq)
  }

  test("mapForSome yields exactly one output and stops") {
    import spark.implicits._
    val out = sample.mapForSome { case (k, v) => if (v > 1) Seq((k, v)) else Nil }
      .ds.collect()
    assert(out.length == 1 && out.head._2 > 1)
  }

  test("mapByPartition sees the partition id (rank-by-rank parity)") {
    import spark.implicits._
    val tagged = sample.mapByPartition((pid, it) => it.map(kv => (kv._1, pid.toLong)))
      .ds.collect()
    assert(tagged.length == 7)
    assert(tagged.map(_._2).forall(p => p >= 0 && p < 3))
  }

  test("placeByKey puts every pair on the partition the app chose (key_as_rank)") {
    import spark.implicits._
    val n = 5
    val src = KVS.generate(spark, (0L until 50L).map(i => (i, i * 10)), 3)
    val placed = src.placeByKey(n)(k => (k % n).toInt)
    val got = placed.ds.rdd
      .mapPartitionsWithIndex((pid, it) => it.map(kv => (kv._1, pid)))
      .collect()
    assert(got.length == 50)
    got.foreach { case (k, pid) => assert(pid == (k % n).toInt, s"key $k on partition $pid") }
  }

  test("save/restore round-trips the KVS through parquet") {
    import spark.implicits._
    val path = "target/graft-tmp/kvs_save_test"
    sample.save(path)
    val back = KVS.restore[String, Long](spark, path)
    assert(back.ds.collect().sorted.toSeq == sample.ds.collect().sorted.toSeq)
  }

  test("aggregateByKey folds incrementally via Aggregator (sum == group fold)") {
    import org.apache.spark.sql.expressions.Aggregator
    import org.apache.spark.sql.{Encoder, Encoders}
    import spark.implicits._
    val sumAgg = new Aggregator[(String, Long), Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: (String, Long)): Long = b + a._2
      def merge(b1: Long, b2: Long): Long = b1 + b2
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
    assert(sample.aggregateByKey(sumAgg).ds.collect().toMap ==
      Map("apple" -> 11L, "banana" -> 7L, "cherry" -> 3L, "date" -> 7L))
  }

  test("shuffleLeveling evens out a zipf-skewed key distribution") {
    import spark.implicits._
    // freq(rank k) ∝ 1/k over 100 keys — hash partitioning collides hot
    // keys; leveling (range partition by weighted sampling) balances
    // counts while keeping equal keys co-located
    // (kmr_shuffle_leveling_pair_count parity).
    val rows = for (k <- 1 to 100; _ <- 1 to (1000 / k)) yield (k.toLong, 0L)
    val leveled = KVS.generate(spark, rows, 4).shuffleLeveling(8)
    val sizes = leveled.histogramByPartition().map(_._2).filter(_ > 0)
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.sum == rows.size)
    assert(sizes.max <= mean * 2.0, s"still skewed: ${sizes.mkString(",")}")
    // co-location preserved
    val perPart = leveled.ds.rdd
      .mapPartitionsWithIndex((i, it) => it.map(kv => (kv._1, i)))
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    assert(perPart.values.forall(_ == 1))
  }

  test("binary keys sort with memcmp semantics (GraySort requirement)") {
    import spark.implicits._
    // kmr_compare_lexicographically (src/kmrbase.c:1703-1725): unsigned
    // bytewise, shorter-is-less on tie. Includes >0x7f bytes to catch
    // signed-byte comparison bugs.
    val keys = Seq(
      Array[Byte](0x01), Array[Byte](0x7f), Array[Byte](0x80.toByte),
      Array[Byte](0xff.toByte), Array[Byte](0x01, 0x00), Array[Byte](),
      Array[Byte](0x00), Array[Byte](0xff.toByte, 0x01))
    val ds = spark.createDataset(keys.zipWithIndex.map { case (k, i) => (k, i.toLong) })
    val sorted = new KVS(ds).sort().ds.collect().map(_._1)
    def memcmpLess(a: Array[Byte], b: Array[Byte]): Boolean = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val x = a(i) & 0xff; val y = b(i) & 0xff
        if (x != y) return x < y
        i += 1
      }
      a.length < b.length
    }
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(!memcmpLess(b, a),
        s"order violation: ${a.mkString(",")} > ${b.mkString(",")}")
      case _ =>
    }
  }
}
