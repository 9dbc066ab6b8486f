package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MinHashAggSpec extends SparkSuite {

  test("native signature equals the 64-column min(pmod) formulation bit-for-bit") {
    import spark.implicits._
    // deterministic pseudo-hashes over several groups and partitions
    val rows = for (g <- 0L until 20L; i <- 0L until 50L) yield
      (g, (g * 7919L + i * 104729L) % 2147483647L, ((g * 31L + i * 65537L) % 2147483645L) + 1L)
    val df = rows.toDF("g", "h1", "h2").repartition(5)
    val native = df.groupBy("g")
      .agg(MinHashAgg.minhashSig(col("h1"), col("h2")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toMap
    val minCols = (0 until 64).map { j =>
      min(pmod(col("h1") + lit(j.toLong) * col("h2"), lit(2147483647L))).as(s"m$j")
    }
    val reference = df.groupBy("g").agg(minCols.head, minCols.tail: _*)
      .collect().map(r => (r.getLong(0), (1 to 64).map(r.getLong(_)))).toMap
    assert(native.keySet == reference.keySet)
    native.foreach { case (g, sig) =>
      assert(sig == reference(g), s"group $g signature diverges")
    }
  }

  test("empty group never reaches eval; single row gives its own hashes") {
    import spark.implicits._
    val one = Seq((1L, 5L, 7L)).toDF("g", "h1", "h2")
      .groupBy("g").agg(MinHashAgg.minhashSig(col("h1"), col("h2")).as("sig"))
      .collect()(0).getSeq[Long](1)
    (0 until 64).foreach { j =>
      assert(one(j) == (5L + j.toLong * 7L) % 2147483647L)
    }
  }
}
