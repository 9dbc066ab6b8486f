package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the packing arithmetic, independent of the
  * fixed test corpus: for arbitrary token-count sequences, concat-and-
  * chunk packing (exclusive prefix div budget) must conserve docs and
  * tokens, assign monotone pack ids, and never start a pack past the
  * corpus's total token count. Runs through the same two-phase prefix
  * sum the gate query uses. */
class TrainPrepPropertySpec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val countsGen: Gen[List[Long]] =
    Gen.listOfN(80, Gen.chooseNum(0L, 300L))

  test("synthetic packing conserves mass and yields monotone pack ids for arbitrary corpora") {
    import spark.implicits._
    val budget = 256L
    samples(countsGen, 6).foreach { counts =>
      val df = counts.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("doc_id", "n_toks")
      val packed = graft.operators.CoreOps
        .prefixSumLong(spark, df, "doc_id", "n_toks", "start_tok", keepVal = true)
        .select(expr(s"start_tok div $budget").as("pack_id"), col("n_toks"))
        .groupBy("pack_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
        .collect().sortBy(_.getLong(0))
      assert(packed.map(_.getLong(1)).sum == counts.length, "doc conservation")
      assert(packed.map(_.getLong(2)).sum == counts.sum, "token conservation")
      val ids = packed.map(_.getLong(0)).toSeq
      assert(ids == ids.sorted && ids.distinct == ids)
      assert(ids.head == 0L)
      // a pack id can never start beyond the corpus's total token mass
      assert(ids.last <= counts.sum / budget)
      // reference: sequential fold computes the same (pack -> docs) map
      val expected = counts.scanLeft(0L)(_ + _).dropRight(1)
        .map(_ / budget).groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(packed.map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
    }
  }

  test("chunking covers arbitrary token arrays exactly, via the production query") {
    import spark.implicits._
    // arbitrary synthetic corpora: docs of 0..120 tokens (0 → no chunks)
    samples(Gen.listOfN(40, Gen.chooseNum(0, 120)), 4).foreach { lens =>
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n)("t").mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory("chunk_prop").toString
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      // the PRODUCTION chunk_docs query over the synthetic table
      val chunks = graft.SparkEntry.queries("chunk_docs")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val byDoc = chunks.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      lens.zipWithIndex.foreach { case (n, i) =>
        byDoc.get(i.toLong) match {
          case None => assert(n == 0, s"doc $i with $n tokens got no chunks")
          case Some(cs) =>
            assert(n > 0, s"empty doc $i got chunks")
            // stride starts 0,24,... strictly below n → (n-1)/24 + 1 chunks
            assert(cs.length == (n - 1) / 24 + 1, s"doc $i ($n toks): ${cs.length} chunks")
            assert(cs.map(_._4).sum ==
              cs.indices.map(k => math.min(32, n - k * 24)).sum, s"doc $i length sum")
            assert(cs.last._3 + cs.last._4 == n, s"doc $i last chunk must end at $n")
        }
      }
    }
  }

  test("split bucketing is stable, uniform-ish, and uses the production expression") {
    import spark.implicits._
    samples(Gen.listOfN(200, Gen.chooseNum(0L, 1000000L)), 4).foreach { rawIds =>
      val ids = rawIds.distinct
      // the PRODUCTION TrainPrep.splitCol — not a local copy that could
      // drift from the query's salt/hash/thresholds
      def run(): Map[String, Long] = ids.toDF("doc_id")
        .select(TrainPrep.splitCol.as("split"))
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val rows = run()
      assert(rows == run(), "split must be identical across evaluations")
      assert(rows.values.sum == ids.length, "every id gets exactly one split")
      // md5 is uniform: an 80% bucket dominates a 10% bucket for any
      // non-tiny id set, whatever the id distribution
      assert(rows.getOrElse("train", 0L) > rows.getOrElse("test", 0L))
      assert(rows.getOrElse("train", 0L) > rows.getOrElse("val", 0L))
    }
  }
}
