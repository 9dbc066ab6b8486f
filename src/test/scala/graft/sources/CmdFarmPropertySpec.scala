package graft.sources

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the per-KV command farm: for arbitrary
  * payloads the round-trip through a real subprocess must be the
  * identity (echo) or a computable function (expr), regardless of
  * partitioning or concurrency — independent of the fixed gate data. */
class CmdFarmPropertySpec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("echo farm is the identity on arbitrary shell-safe payloads at any concurrency") {
    import spark.implicits._
    // alphanumeric + safe punctuation: quoting arbitrary bytes through
    // `sh -c` is the CALLER's job (as with the reference), so the
    // property quantifies over payloads that need no quoting
    val payload = for {
      n <- Gen.chooseNum(1, 20)
      s <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 1 -> Gen.const('.'), 1 -> Gen.const('_')))
    } yield s.mkString
    val listGen = Gen.listOfN(25, payload)
    samples(Gen.zip(listGen, Gen.chooseNum(1, 8)), 3).foreach { case (ps, conc) =>
      val kvs = ps.zipWithIndex.map { case (p, i) => (i.toString, s"echo $p") }
      val out = CmdFarm.mapCommands(kvs.toDS.repartition(3), conc)
        .collect().toMap
      ps.zipWithIndex.foreach { case (p, i) =>
        assert(out(i.toString) == p, s"payload $i corrupted: '${out(i.toString)}' != '$p'")
      }
    }
  }

  test("arithmetic farm computes each row's own expression (no cross-row mixing)") {
    import spark.implicits._
    val numGen = Gen.listOfN(20, Gen.zip(Gen.chooseNum(-999L, 999L), Gen.chooseNum(1L, 99L)))
    samples(numGen, 3).foreach { nums =>
      val kvs = nums.zipWithIndex.map { case ((a, b), i) =>
        (i.toString, s"echo $$(( $a * $b ))")
      }
      val out = CmdFarm.mapCommands(kvs.toDS.repartition(4), maxConcurrent = 4)
        .collect().toMap
      nums.zipWithIndex.foreach { case ((a, b), i) =>
        assert(out(i.toString) == (a * b).toString,
          s"row $i: got '${out(i.toString)}' want ${a * b}")
      }
    }
  }

  test("checkpointed pipeline result is invariant to where the kill happens") {
    import spark.implicits._
    // for arbitrary inputs and ANY kill point, restart converges to the
    // no-checkpoint reference result
    val dataGen = Gen.listOfN(60, Gen.zip(Gen.chooseNum(0, 6), Gen.chooseNum(-1000L, 1000L)))
    samples(Gen.zip(dataGen, Gen.chooseNum(0, 1)), 3).foreach { case (rows, killAt) =>
      val dir = java.nio.file.Files.createTempDirectory("ckpt_prop").toString
      val pairs = rows.map { case (k, v) => (s"k$k", v) }
      def pipeline(kill: Int): Seq[(String, Long)] = {
        val s1 = graft.core.Checkpoint.stage(spark, dir, "s1") {
          graft.core.KVS.generate(spark, pairs)
        }
        if (kill == 0) throw new RuntimeException("killed after s1")
        val s2 = graft.core.Checkpoint.stage(spark, dir, "s2") {
          s1.reduceByKey(_ + _)
        }
        if (kill == 1) throw new RuntimeException("killed after s2")
        s2.ds.collect().toSeq.sorted
      }
      intercept[RuntimeException](pipeline(killAt))
      val resumed = pipeline(kill = 99)
      val expect = pairs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sorted
      assert(resumed == expect, s"killAt=$killAt diverged")
    }
  }
}
