package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Asserts the operator properties the QueryDefs rely on (referenced from
  * CoreOps scaladoc): prefix-sum == sequential fold, ranking contiguity,
  * repartition balance. */
class CoreOpsSpec extends SparkSuite {

  test("prefixSumLong equals the sequential non-inclusive fold") {
    import spark.implicits._
    val n = 1000
    // deterministic pseudo-random values, deliberately unsorted input order
    val rows = (0 until n).map(i => ((i * 7919) % n, ((i * 104729) % 1000).toLong))
      .map { case (k, v) => (k.toLong, v) }
    val df = rows.toDF("k", "v")
    val got = CoreOps.prefixSumLong(spark, df, "k", "v", "pre")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    rows.sortBy(_._1).zip(got).foreach { case ((k, v), (gk, gpre)) =>
      assert(gk == k)
      assert(gpre == acc, s"prefix at key $k")
      acc += v
    }
  }

  test("prefixSumLong treats null values as zero") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)))
      .toDF("k", "v")
    val got = CoreOps.prefixSumLong(spark, df, "k", "v", "pre")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 0L), (2L, 10L), (3L, 10L)))
  }

  test("rankByOrder: contiguous 0..n-1, ordered by the sort key, multi-partition") {
    import spark.implicits._
    val n = 5000
    val df = (0 until n).map(i => ((i * 7919) % n, i)).toDF("key", "payload")
    val ranked = CoreOps.rankByOrder(df, Seq(col("key")), "rank")
    val rows = ranked.collect().map(r => (r.getInt(0), r.getLong(2))).sortBy(_._2)
    assert(rows.map(_._2).toSeq == (0L until n.toLong))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // the plan must not funnel through one task
    assert(ranked.rdd.getNumPartitions > 1)
  }

  test("distribute (repartition n) balances events partitions") {
    val df = graft.Tables.load(spark, sfDir, "events").repartition(8)
    val sizes = df.rdd.mapPartitionsWithIndex((i, it) => Iterator(it.size)).collect()
    assert(sizes.sum > 0)
    assert(sizes.max - sizes.min <= math.max(1, sizes.sum / 100),
      s"unbalanced: ${sizes.mkString(",")}")
  }

  test("graysort head is in strict memcmp order (hex is order-preserving)") {
    val rows = CoreOps.defs.find(_.name == "graysort").get.fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 100)
    assert(rows.map(_._2).toSeq == (0L until 100L))
    rows.map(_._1).sliding(2).foreach {
      case Array(a, b) => assert(a < b, s"order violation: $a >= $b")
      case _ =>
    }
  }

  test("every oracled QueryDef returns rows at sf0.001") {
    (graft.queries.Tpch.defs ++ CoreOps.defs).foreach { q =>
      val n = q.fn(spark, sfDir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
