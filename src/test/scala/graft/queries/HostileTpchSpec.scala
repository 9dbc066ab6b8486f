package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Robustness net for the relational family: the sf0.001 star schema
  * with corrupted fact rows spliced into lineitem and orders — NaN and
  * 1e300 money values (beyond DECIMAL(18,6)), NULL join keys, NULL
  * dates, negative quantities. A single corrupt row must degrade (NULL
  * measure, dropped join row) rather than kill a 100 TB job with ANSI
  * CAST/overflow errors. */
class HostileTpchSpec extends SparkSuite {

  private val relationalQueries = Seq(
    "q1_pricing", "q3_topk", "q5_local", "q7_volume", "q9_profit",
    "q10_returns", "q13_custdist", "q14_promo", "q17_avgqty", "q18_topq",
    "q19_disjunct", "q21_exists", "q21_sole", "rollup_stats",
    "set_except", "set_intersect",
    "q4_priority", "q6_forecast", "q8_share", "q12_priority",
    "q15_topsupp", "q22_global", "triangle_count", "bfs_hops",
    "skyline_parts", "degree_dist", "clustering_coeff")

  private lazy val hostileDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("hostile_tpch").toString
    val src = graft.SparkTest.sfDir
    graft.Tables.names.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = t match {
        case "lineitem" =>
          df.unionByName(df.limit(3).withColumn("l_extendedprice", lit(Double.NaN)))
            .unionByName(df.limit(3).withColumn("l_extendedprice", lit(1e300)))
            .unionByName(df.limit(2)
              .withColumn("l_orderkey", lit(null).cast("long"))
              .withColumn("l_partkey", lit(null).cast("long")))
            .unionByName(df.limit(2).withColumn("l_shipdate",
              lit(null).cast(df.schema("l_shipdate").dataType)))
            .unionByName(df.limit(2).withColumn("l_quantity", lit(-5.0)))
            .unionByName(df.limit(2).withColumn("l_quantity", lit(Double.NaN)))
            .unionByName(df.limit(2).withColumn("l_quantity", lit(1e300)))
        case "orders" =>
          df.unionByName(df.limit(2).withColumn("o_custkey", lit(null).cast("long")))
            .unionByName(df.limit(2).withColumn("o_orderdate",
              lit(null).cast(df.schema("o_orderdate").dataType)))
        case "part" =>
          df.unionByName(df.limit(2).withColumn("p_retailprice", lit(Double.NaN)))
            .unionByName(df.limit(2).withColumn("p_size", lit(null).cast("int")))
        case _ => df
      }
      out.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  relationalQueries.foreach { name =>
    test(s"$name survives corrupted fact rows") {
      graft.SparkEntry.queries(name)(spark, hostileDir).collect()
    }
  }

  test("dq_audit counts every class of spliced corruption") {
    val audit = graft.SparkEntry.queries("dq_audit")(spark, hostileDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the splices above: 2 NaN l_quantity, 2 negative l_quantity, 2 NULL
    // l_orderkey (orphans — a NULL key matches nothing), 2 NULL
    // o_custkey, 2 NULL o_orderdate; clean-data checks stay zero
    assert(audit("lineitem_null_or_nan_qty") >= 2, audit.toString)
    assert(audit("lineitem_nonpositive_qty") >= 2, audit.toString)
    assert(audit("lineitem_orphan_orderkey") >= 2, audit.toString)
    assert(audit("orders_orphan_custkey") >= 2, audit.toString)
    assert(audit("orders_null_date") == 2, audit.toString)
    assert(audit("lineitem_discount_range") == 0, audit.toString)
    // the splices duplicate existing pk pairs, so dup_pk must rise
    // strictly above the clean baseline
    val clean = graft.SparkEntry.queries("dq_audit")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit("lineitem_dup_pk") > clean("lineitem_dup_pk"), s"$audit vs $clean")
  }
}
