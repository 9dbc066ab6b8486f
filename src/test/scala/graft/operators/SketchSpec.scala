package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSuite {

  test("approx_count_distinct is within the configured error of exact") {
    val exact = graft.Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // gate certificate: exact_users must match, err_ok must be 1
    val cert = EventOps.defs.find(_.name == "approx_distinct").get
      .fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(cert.nonEmpty)
    cert.foreach { case (k, ex, ok) =>
      assert(ex == exact(k), s"$k: certificate exact $ex vs $exact")
      assert(ok == 1L, s"$k: estimate outside the 10% band")
    }
    // raw-estimate shape: the sketch value itself is within band
    val approx = graft.Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("au"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.1, s"$k: approx $ap vs exact $ex")
    }
  }

  test("hll_partitioned: per-day sketch union is lossless and error-banded") {
    // The gate query now emits the certificate directly — every type
    // must report a multi-day merge with union_lossless=1 and err_ok=1.
    val out = EventOps.defs.find(_.name == "hll_partitioned").get
      .fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (et, nDays, lossless, errOk) =>
      assert(nDays > 1, s"$et: single-day fixture defeats the merge test")
      assert(lossless == 1L, s"$et: 2-level union != 1-level sketch")
      assert(errOk == 1L, s"$et: estimate outside the 5% band")
    }
    // raw-estimate shape: the unioned estimate itself is a positive count
    val est = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("day"), col("user_id"))
      .groupBy("event_type", "day")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.values.forall(_ > 0))
  }

  test("approx median is within 5% of the exact median per event type") {
    // gate certificate: rank_ok must hold for every type
    val cert = graft.queries.Analytics.defs.find(_.name == "approx_quantiles").get
      .fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(cert.nonEmpty)
    cert.foreach { case (k, ok) =>
      assert(ok == 1L, s"$k: approx p50 rank outside the n/500 band")
    }
    // raw-value shape: the sketch median itself is within 5% of exact
    val exact = graft.queries.Analytics.defs.find(_.name == "quantiles").get
      .fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap // p50_cents
    val approx = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"), graft.Tables.cents.as("c"))
      .filter(col("c").isNotNull)
      .groupBy("event_type")
      .agg(percentile_approx(col("c"), lit(0.5), lit(1000)).as("p50"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) / ex <= 0.05,
        s"$k: approx ${approx(k)} vs exact $ex")
    }
  }

  test("Misra-Gries guarantee: every item above N/(k+1) survives, counts are lower bounds") {
    import spark.implicits._
    import graft.functions.FreqItemsAgg
    // adversarial stream: one heavy item drowned in unique noise, spread
    // over 8 partitions so the merge path runs
    val n = 10000
    val rows = (0 until n).map(i => if (i % 5 == 0) "hot" else s"noise_$i")
    val k = 16
    val out = rows.toDF("tok").repartition(8)
      .agg(FreqItemsAgg.freqItems(col("tok"), k).as("s"))
      .select(explode(col("s")))
      .select("col.item", "col.min_count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size <= k, s"sketch exceeded $k counters: ${out.size}")
    val trueHot = n / 5
    val eps = n / (k + 1)
    assert(trueHot > eps) // the premise: "hot" is guaranteed to survive
    assert(out.contains("hot"), s"guaranteed heavy hitter evicted: $out")
    assert(out("hot") <= trueHot && out("hot") >= trueHot - eps,
      s"count ${out("hot")} outside [${trueHot - eps}, $trueHot]")
  }

  test("approx_topk certificate is clean and the sketch heads with the exact top token") {
    // gate shape: one certificate row, zero missing heavy hitters, zero
    // bound violations, and at least one heavy hitter to make it real
    val cert = graft.llm.TextOps.defs.find(_.name == "approx_topk").get
      .fn(spark, sfDir).collect()
    assert(cert.length == 1)
    val row = cert.head
    assert(row.getLong(0) > 0L, "empty token stream")
    assert(row.getLong(1) > 0L, "no heavy hitters — certificate is vacuous")
    assert(row.getLong(2) == 0L, "a guaranteed heavy hitter is missing")
    assert(row.getLong(3) == 0L, "a reported count violates the MG bound")
    // listing shape: the most frequent document token must head the
    // sketch (its margin over N/257 is huge on natural text)
    val top = graft.Tables.load(spark, sfDir, "documents")
      .select(explode(graft.llm.TextNorm.toks).as("tok"))
      .filter(length(col("tok")) > 0)
      .agg(graft.functions.FreqItemsAgg.freqItems(col("tok"), 256).as("sketch"))
      .select(posexplode(col("sketch")))
      .select((col("pos") + 1).cast("long").as("rk"),
        col("col.item").as("item"), col("col.min_count").as("min_count"))
      .filter(col("rk") <= 20).orderBy("rk")
      .collect()
    assert(top.nonEmpty && top.head.getLong(0) == 1L)
    val exactTop = graft.Tables.load(spark, sfDir, "documents")
      .select(explode(graft.llm.TextNorm.toks).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").count().orderBy(desc("count"), col("tok"))
      .limit(1).collect().head
    assert(top.head.getString(1) == exactTop.getString(0),
      s"sketch top '${top.head.getString(1)}' != exact top '${exactTop.getString(0)}'")
    assert(top.head.getLong(2) <= exactTop.getLong(1),
      "reported count must be a lower bound")
  }
}
