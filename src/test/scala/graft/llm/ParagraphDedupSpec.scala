package graft.llm

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** dedup_paragraph: MassiveText/Dolma-style chunk-level dedup — fixed
  * 20-word chunks, global first occurrence wins, per-doc survival
  * stats + keep verdict. */
class ParagraphDedupSpec extends SparkSuite {

  private def run() = graft.SparkEntry.queries("dedup_paragraph")(spark, sfDir)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("chunk accounting: every doc appears once, n_chunks = ceil(words/20), " +
      "n_dup <= n_chunks, keep_doc is the majority rule") {
    val out = run()
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(TextNorm.toks).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.map(_._1).toSet == docs.filter(_._2 >= 1).keySet)
    assert(out.map(_._1).distinct.length == out.length)
    out.foreach { case (id, nChunks, nDup, keep) =>
      assert(nChunks == math.ceil(docs(id) / 20.0).toLong,
        s"doc $id: $nChunks chunks for ${docs(id)} words")
      assert(nDup >= 0 && nDup <= nChunks)
      assert(keep == (if (nDup * 2 <= nChunks) 1L else 0L))
    }
  }

  test("globally, exactly one instance of every distinct chunk is kept") {
    val out = run()
    val keptInstances = out.map { case (_, n, d, _) => n - d }.sum
    // kept instances == number of DISTINCT chunk hashes in the corpus
    val distinctChunks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TextNorm.toks.as("w"))
      .filter(size(col("w")) >= 1)
      .select(explode(expr(
        "transform(sequence(0, cast(ceil(size(w) / 20.0) AS INT) - 1), " +
        "c -> array_join(slice(w, c * 20 + 1, 20), ' '))")).as("chunk"))
      .agg(countDistinct("chunk")).collect()(0).getLong(0)
    assert(keptInstances == distinctChunks,
      s"kept $keptInstances instances vs $distinctChunks distinct chunks")
  }

  test("delta probe equals a driver set-replay: n_dup counts exactly the delta " +
      "chunks whose hash exists in the src0 corpus") {
    val got = graft.SparkEntry.queries("dedup_paragraph_delta")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val srcOf = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = Dedup.paragraphChunks(Tables.load(spark, sfDir, "documents"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val corpusH = chunks.collect { case (id, h) if srcOf(id) == "src0" => h }.toSet
    val byDelta = chunks.filter { case (id, _) => srcOf(id) != "src0" }
      .groupBy(_._1)
    assert(got.map(_._1).toSet == byDelta.keySet,
      "delta output must cover exactly the non-src0 docs with >= 1 word")
    got.foreach { case (id, nChunks, nDup, keep) =>
      val hs = byDelta(id).map(_._2)
      assert(nChunks == hs.length.toLong, s"doc $id chunk count")
      val expDup = hs.count(corpusH.contains).toLong
      assert(nDup == expDup, s"doc $id: n_dup $nDup vs replay $expDup")
      assert(keep == (if (nDup * 2 <= nChunks) 1L else 0L))
    }
  }

  test("a doc that is a verbatim copy of another loses every chunk and is dropped") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ") // 3 chunks
    val docs = Seq(
      (10L, base),                     // original: keeps all 3
      (20L, base),                     // verbatim copy: loses all 3
      (30L, (1 to 20).map(i => s"uniq$i").mkString(" ")) // untouched
    ).toDF("doc_id", "text")
    // drive the same pipeline shape on the fixture via a temp dir-less
    // path: re-implement the call through the public query on a view is
    // not possible (it loads from dir), so assert through the same
    // building blocks the gate uses
    val chunks = docs
      .select(col("doc_id"), TextNorm.toks.as("w"))
      .filter(size(col("w")) >= 1)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, cast(ceil(size(w) / 20.0) AS INT) - 1), " +
        "c -> array_join(slice(w, c * 20 + 1, 20), ' '))")))
      .toDF("doc_id", "idx", "chunk")
    val firstOwner = chunks.groupBy("chunk")
      .agg(min(struct(col("doc_id"), col("idx"))).as("w0"))
    val byId = chunks.join(firstOwner, "chunk")
      .select(col("doc_id"),
        when(col("w0.doc_id") === col("doc_id") &&
             col("w0.idx") === col("idx"), 0L).otherwise(1L).as("dup"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("dup").as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(10L) == (3L, 0L), s"original must keep all: ${byId(10L)}")
    assert(byId(20L) == (3L, 3L), s"copy must lose all: ${byId(20L)}")
    assert(byId(30L) == (1L, 0L))
  }
}
