package graft.queries

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the round-5 robust-stats additions,
  * independent of the fixed test corpus: the PRODUCTION gate queries
  * run over arbitrary generated tables and must agree with brute-force
  * definitions (sorted low-median / quadratic dominance scan) that
  * share no code with the histogram / suffix-min implementations. */
class AnalyticsPropertySpec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def lowMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)

  test("dq_audit counts equal a driver-side recount on arbitrary corrupted tables") {
    import spark.implicits._
    val qtyGen = Gen.frequency(
      6 -> Gen.chooseNum(1.0, 50.0), 1 -> Gen.const(Double.NaN),
      1 -> Gen.chooseNum(-10.0, 0.0), 1 -> Gen.const(25.0))
    val discGen = Gen.frequency(
      7 -> Gen.chooseNum(0.0, 1.0), 1 -> Gen.const(Double.NaN),
      1 -> Gen.chooseNum(1.0001, 3.0), 1 -> Gen.chooseNum(-2.0, -0.0001))
    val liGen = Gen.listOfN(150, Gen.zip(
      Gen.chooseNum(1L, 30L), Gen.chooseNum(1, 4), qtyGen, discGen))
    samples(liGen, 3).foreach { li =>
      val dir = java.nio.file.Files.createTempDirectory("dq_prop").toString
      // orders cover keys 1..20 only -> lineitems on 21..30 are orphans
      val orders = (1L to 20L).map(o => (o, o % 7 + 1,
        if (o % 5 == 0) None else Some(new java.sql.Timestamp(o * 86400000L))))
      li.map { case (ok, ln, q, dc) => (ok, ln, q, dc) }
        .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      orders.toDF("o_orderkey", "o_custkey", "o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      // customers cover 1..5 -> o_custkey 6..8 are orphans
      (1L to 5L).map(Tuple1(_)).toDF("c_custkey")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val out = graft.SparkEntry.queries("dq_audit")(spark, dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = Map(
        "lineitem_null_or_nan_qty" -> li.count(_._3.isNaN).toLong,
        "lineitem_nonpositive_qty" -> li.count(r => !r._3.isNaN && r._3 <= 0).toLong,
        "lineitem_discount_range" -> li.count(r => r._4.isNaN || r._4 < 0 || r._4 > 1).toLong,
        "lineitem_dup_pk" -> li.groupBy(r => (r._1, r._2)).count(_._2.size > 1).toLong,
        "lineitem_orphan_orderkey" -> li.count(_._1 > 20).toLong,
        "orders_null_date" -> orders.count(_._3.isEmpty).toLong,
        "orders_orphan_custkey" -> orders.count(_._2 > 5).toLong)
      assert(out == expect, s"audit mismatch:\n$out\nvs\n$expect")
    }
  }

  test("scd2_build equals a sequential run-length fold on arbitrary event streams") {
    import spark.implicits._
    // duplicate timestamps and tiny type alphabets maximize the
    // tie-break and run-collapse edge cases the fixed corpus undersells
    val gen = Gen.listOfN(200,
      Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 40L), Gen.oneOf("x", "y")))
    samples(gen, 4).foreach { rows =>
      val dir = java.nio.file.Files.createTempDirectory("scd2_prop").toString
      rows.zipWithIndex.map { case ((u, tsMs, t), i) =>
        (i.toLong, tsMs * 1000000L, u, t, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = graft.SparkEntry.queries("scd2_build")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
      // sequential replay: order by (ts_us, event_id) per user, collapse
      // equal-type runs, close each version at the next run's start
      val expect = rows.zipWithIndex
        .map { case ((u, tsMs, t), i) => (u, tsMs * 1000L, i.toLong, t) }
        .groupBy(_._1).toSeq.flatMap { case (u, es) =>
          val ordered = es.sortBy(e => (e._2, e._3))
          val runs = ordered.foldLeft(List.empty[(String, Long)]) {
            case (acc, (_, ts, _, t)) =>
              if (acc.nonEmpty && acc.head._1 == t) acc else (t, ts) :: acc
          }.reverse
          runs.zipWithIndex.map { case ((t, from), v) =>
            (u, (v + 1).toLong, t, from,
              if (v + 1 < runs.length) Some(runs(v + 1)._2) else None)
          }
        }.sortBy(x => (x._1, x._2))
      assert(out.toSeq == expect, s"SCD2 mismatch on generated stream")
    }
  }

  test("median_mad equals brute-force low medians on arbitrary event streams") {
    import spark.implicits._
    val gen = Gen.listOfN(300, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-500L, 500L)))
    samples(gen, 4).foreach { rows =>
      val dir = java.nio.file.Files.createTempDirectory("mm_prop").toString
      rows.zipWithIndex.map { case ((t, cents), i) =>
        (i.toLong, i.toLong * 1000L, 1L, t, cents.toDouble / 100.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = graft.SparkEntry.queries("median_mad")(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      rows.groupBy(_._1).foreach { case (t, vs) =>
        val cs = vs.map(_._2)
        val med = lowMedian(cs)
        val mad = lowMedian(cs.map(c => math.abs(c - med)))
        assert(out(t) == ((cs.length.toLong, med, mad)), s"median/MAD mismatch for $t")
      }
    }
  }

  test("skyline_parts equals the quadratic dominance scan on arbitrary part tables") {
    import spark.implicits._
    val gen = Gen.listOfN(120, Gen.zip(Gen.chooseNum(1, 12), Gen.chooseNum(100L, 2000L)))
    samples(gen, 4).foreach { rows =>
      val dir = java.nio.file.Files.createTempDirectory("sky_prop").toString
      val parts = rows.zipWithIndex.map { case ((size, cents), i) =>
        (i.toLong, s"part$i", "B", "T", size, cents.toDouble / 100.0)
      }
      parts.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
      val out = graft.SparkEntry.queries("skyline_parts")(spark, dir)
        .collect().map(_.getLong(0)).toSet
      val pts = parts.map(p => (p._1, p._5.toLong, Math.round(p._6 * 100.0)))
      def dominated(b: (Long, Long, Long)) = pts.exists(a =>
        a._2 >= b._2 && a._3 <= b._3 && (a._2 > b._2 || a._3 < b._3))
      pts.foreach { p =>
        assert(out.contains(p._1) == !dominated(p),
          s"part ${p._1} membership wrong (size=${p._2}, cents=${p._3})")
      }
    }
  }
}
