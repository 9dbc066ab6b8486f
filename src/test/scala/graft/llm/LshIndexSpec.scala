package graft.llm

import graft.SparkSuite

/** The persisted SRP band index (AnnOps.lshIndex) must serve exactly
  * the rows a fresh in-line bucket computation produces — a stale or
  * torn index would silently miss (or invent) candidate collisions
  * for the delta probe, which the hash gate only catches if the
  * corpus happens to exercise the drifted buckets. */
class LshIndexSpec extends SparkSuite {

  test("served band index == inline bucket computation, row for row") {
    val served = AnnOps.lshIndex(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val nb = AnnOps.bandBitsFor(graft.Tables.cachedCount(spark, sfDir, "embeddings"))
    val fresh = {
      import org.apache.spark.sql.functions._
      val v = graft.Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      AnnOpsTestHook.buckets(spark, v, nb)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(served == fresh,
      s"index drift: served ${served.size} rows, fresh ${fresh.size}; " +
        s"diff ${(served diff fresh).take(3)} / ${(fresh diff served).take(3)}")
    assert(served.nonEmpty)
    // every vector carries exactly LshBands band rows (conservation)
    val perVec = served.groupBy(_._1).values.map(_.size).toSet
    assert(perVec == Set(8), s"band conservation broken: $perVec")
  }

  test("lsh_bucket_stats serves from the persisted index, not a recompute") {
    // r15 verdict item 3's done-criterion: the occupancy telemetry must
    // describe exactly the table the delta ingest path probes — its plan
    // reads the lsh_bands relation and contains no signature pipeline
    // (no plane family, no embeddings scan).
    val plan = graft.SparkEntry.queries("lsh_bucket_stats")(spark, sfDir)
      .queryExecution.optimizedPlan.toString()
    assert(plan.contains("lsh_bands"), s"stats should scan the band index:\n$plan")
    assert(!plan.contains("rp|"), s"stats recompute the plane family:\n$plan")
    assert(!plan.contains("embeddings"), s"stats re-scan the corpus:\n$plan")
  }
}

/** Test-only bridge to the private bucket builder (the spec needs the
  * raw rows, not a gate's aggregate view). */
private[llm] object AnnOpsTestHook {
  def buckets(s: org.apache.spark.sql.SparkSession,
      v: org.apache.spark.sql.DataFrame, nb: Int)
      : org.apache.spark.sql.DataFrame = AnnOps.lshBucketsForTest(s, v, nb)
}
