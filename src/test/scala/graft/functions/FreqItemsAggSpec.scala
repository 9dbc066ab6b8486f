package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated properties for the Misra-Gries aggregate over
  * arbitrary streams and partitionings (fixed seeds, reproducible):
  * the N/(k+1) heavy-hitter guarantee, the lower-bound property, and
  * the k-counter bound must hold for EVERY input and EVERY parallel
  * merge order — not just the single adversarial case SketchSpec pins. */
class FreqItemsAggSpec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  // small alphabet + zipf-ish skew so some items cross the threshold
  private val streamGen: Gen[List[String]] =
    Gen.listOfN(400, Gen.frequency(
      8 -> Gen.const("head"),
      4 -> Gen.oneOf("warm1", "warm2"),
      3 -> Gen.choose(0, 30).map(i => s"mid_$i"),
      5 -> Gen.choose(0, 10000).map(i => s"tail_$i")))

  test("MG guarantee holds for arbitrary streams across arbitrary partition counts") {
    import spark.implicits._
    val k = 8
    samples(Gen.zip(streamGen, Gen.choose(1, 7)), 10).foreach { case (items, parts) =>
      val n = items.length
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val out = items.toDF("tok").repartition(parts)
        .agg(FreqItemsAgg.freqItems(col("tok"), k).as("s"))
        .select(explode(col("s"))).select("col.item", "col.min_count")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size <= k, s"more than $k counters: ${out.size}")
      val eps = n / (k + 1)
      truth.foreach { case (item, c) =>
        if (c > eps)
          assert(out.contains(item),
            s"item '$item' (count $c > $eps) evicted [n=$n parts=$parts]")
      }
      out.foreach { case (item, reported) =>
        val t = truth(item)
        assert(reported <= t && reported >= t - eps,
          s"'$item' reported $reported outside [${t - eps}, $t]")
      }
    }
  }
}
