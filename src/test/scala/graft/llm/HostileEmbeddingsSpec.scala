package graft.llm

import graft.SparkSuite

/** Robustness net for the embeddings-table operators: NULL vectors,
  * empty vectors, zero vectors (undefined cosine), NaN components,
  * mismatched dimensions, and extreme magnitudes — the contamination a
  * production vector store actually contains. */
class HostileEmbeddingsSpec extends SparkSuite {

  private val embeddingQueries = Seq(
    "ann_cosine_topk", "ann_ivf_topk", "ann_rerank", "embed_quantize",
    "dedup_embedding", "dedup_embedding_lsh", "kmeans_clusters",
    "matmul_gram", "label_centroids")

  private lazy val hostileDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hostile_embs").toString
    val rows = Seq(
      (0L, Array(0.1f, 0.2f, 0.3f, 0.4f), 0),
      (1L, Array(0.4f, 0.3f, 0.2f, 0.1f), 0),
      (2L, Array(0f, 0f, 0f, 0f), 1),                       // zero vector
      (3L, null.asInstanceOf[Array[Float]], 1),             // null vector
      (4L, Array.empty[Float], 2),                          // empty vector
      (5L, Array(Float.NaN, 1f, 2f, 3f), 2),                // NaN component
      (6L, Array(1f), 0),                                   // short vector
      (7L, Array(1e30f, -1e30f, 1e30f, -1e30f), 1),         // extreme magnitude
      (8L, Array(0.5f, 0.5f, 0.5f, 0.5f), 3),
      (9L, Array(-0.5f, 0.5f, -0.5f, 0.5f), 3))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  embeddingQueries.foreach { name =>
    test(s"$name survives the hostile vector store") {
      graft.SparkEntry.queries(name)(spark, hostileDir).collect()
    }
  }
}
