package graft.core

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated properties for the order-sensitive operators
  * (reference invariants from test1.c, randomized over fixed seeds so
  * runs are reproducible): global sort produces the sorted multiset,
  * scanOnValues equals the sequential prefix fold, ranking is always a
  * 0..n-1 bijection — for inputs with duplicates and negatives. */
class KVSPropertySpec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val pairsGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, Gen.zip(Gen.chooseNum(-50L, 50L), Gen.chooseNum(-1000L, 1000L)))

  test("sort yields the sorted multiset for arbitrary inputs") {
    import spark.implicits._
    samples(pairsGen, 8).foreach { pairs =>
      val sorted = KVS.generate(spark, pairs, numPartitions = 3).sort().ds.collect()
      assert(sorted.map(_._1).toSeq == pairs.map(_._1).sorted)
      assert(sorted.sorted.toSeq == pairs.sorted)
    }
  }

  test("scanOnValues equals the sequential non-inclusive fold in sort order") {
    import spark.implicits._
    samples(Gen.listOfN(40, Gen.chooseNum(-1000L, 1000L)), 6).foreach { vals =>
      // unique keys so the total order is well-defined
      val pairs = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val kvs = new KVS(KVS.generate(spark, pairs, 3).ds.orderBy("_1"))
      val got = kvs.scanOnValues(0L)(_ + _).ds.collect().sortBy(_._1).map(_._2).toSeq
      val expect = pairs.map(_._2).scanLeft(0L)(_ + _).dropRight(1)
      assert(got == expect)
    }
  }

  test("ranking is a 0..n-1 bijection for arbitrary inputs") {
    import spark.implicits._
    samples(pairsGen, 8).foreach { pairs =>
      val ranked = KVS.generate(spark, pairs, 3).ranking.ds.collect()
      assert(ranked.map(_._1).sorted.toSeq == (0L until pairs.length.toLong))
      assert(ranked.map(_._2).sorted.toSeq == pairs.sorted)
    }
  }
}
