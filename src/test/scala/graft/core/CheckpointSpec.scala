package graft.core

import graft.SparkSuite
import java.util.concurrent.atomic.AtomicInteger

/** Checkpoint/restart semantics (reference ex/testckpt1-4.c: a killed
  * job re-runs and must skip completed operations, resuming to the
  * identical result). */
class CheckpointSpec extends SparkSuite {

  private def freshDir(tag: String): String = {
    val d = s"target/graft-tmp/ckptspec_$tag"
    Checkpoint.clear(spark, d)
    d
  }

  test("a committed stage is restored, not recomputed, on re-execution") {
    import spark.implicits._
    val dir = freshDir("skip")
    val computes = new AtomicInteger(0)
    def run(): Seq[(String, Long)] = {
      val s1 = Checkpoint.stage(spark, dir, "s1") {
        computes.incrementAndGet()
        KVS.generate(spark, Seq(("a", 1L), ("b", 2L), ("a", 3L)))
      }
      s1.reduceByKey(_ + _).ds.collect().toSeq.sorted
    }
    val first = run()
    assert(computes.get() == 1)
    val second = run()
    assert(computes.get() == 1, "committed stage must not recompute")
    assert(first == second && first == Seq(("a", 4L), ("b", 2L)))
  }

  test("a job killed between stages resumes from the snapshot to the identical result") {
    import spark.implicits._
    val dir = freshDir("resume")
    val stage1Computes = new AtomicInteger(0)
    def pipeline(failBeforeStage2: Boolean): Seq[(String, Long)] = {
      val s1 = Checkpoint.stage(spark, dir, "s1") {
        stage1Computes.incrementAndGet()
        KVS.generate(spark, (0L until 100L).map(i => (s"k${i % 7}", i)))
      }
      if (failBeforeStage2) throw new RuntimeException("killed")
      val s2 = Checkpoint.stage(spark, dir, "s2") {
        s1.reduceByKey(_ + _)
      }
      s2.ds.collect().toSeq.sorted
    }
    // run 1 dies after stage 1 committed
    intercept[RuntimeException](pipeline(failBeforeStage2 = true))
    assert(stage1Computes.get() == 1)
    // run 2 (the restart) must skip stage 1 and finish
    val resumed = pipeline(failBeforeStage2 = false)
    assert(stage1Computes.get() == 1, "restart must restore stage 1, not recompute")
    // reference result: the same pipeline with no checkpointing at all
    val expect = (0L until 100L).map(i => (s"k${i % 7}", i))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sorted
    assert(resumed == expect)
  }

  test("an UNCOMMITTED (partial) snapshot is recomputed, not trusted") {
    import spark.implicits._
    val dir = freshDir("partial")
    // fabricate a torn snapshot: directory exists, no _SUCCESS marker
    val p = new org.apache.hadoop.fs.Path(s"$dir/s1/part-garbage")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p); out.write(Array[Byte](1, 2, 3)); out.close()
    val computes = new AtomicInteger(0)
    val s1 = Checkpoint.stage(spark, dir, "s1") {
      computes.incrementAndGet()
      KVS.generate(spark, Seq(("x", 42L)))
    }
    assert(computes.get() == 1, "missing _SUCCESS must force recompute")
    assert(s1.ds.collect().toSeq == Seq(("x", 42L)))
    assert(Checkpoint.committed(spark, s"$dir/s1"))
  }

  test("a superseded writer fails loudly instead of racing a re-claimed dir") {
    import spark.implicits._
    val dir = freshDir("epoch")
    val tokenA = Checkpoint.claim(spark, dir)
    // run B takes over the directory (a concurrent restart of the job)
    val tokenB = Checkpoint.claim(spark, dir)
    assert(tokenA != tokenB)
    assert(Checkpoint.currentWriter(spark, dir).contains(tokenB))
    // A's guarded write on an uncommitted stage must abort, not publish
    val ex = intercept[IllegalStateException] {
      Checkpoint.stage(spark, dir, "s1", tokenA) {
        KVS.generate(spark, Seq(("a", 1L)))
      }
    }
    assert(ex.getMessage.contains("re-claimed"))
    // B still writes fine, and an already-committed stage restores for
    // anyone regardless of claim (reads don't race)
    val fromB = Checkpoint.stage(spark, dir, "s1", tokenB) {
      KVS.generate(spark, Seq(("b", 2L)))
    }
    assert(fromB.ds.collect().toSeq == Seq(("b", 2L)))
    val readBack = Checkpoint.stage(spark, dir, "s1", tokenA) {
      KVS.generate(spark, Seq(("never", 0L)))
    }
    assert(readBack.ds.collect().toSeq == Seq(("b", 2L)),
      "a committed stage restores without consulting the claim")
  }

  test("clearStale expires old committed snapshots and spares in-flight dirs") {
    import spark.implicits._
    val dir = freshDir("gc")
    Checkpoint.stage(spark, dir, "old")(KVS.generate(spark, Seq(("o", 1L))))
    Checkpoint.stage(spark, dir, "fresh")(KVS.generate(spark, Seq(("f", 2L))))
    // an uncommitted (torn) stage dir must survive GC no matter its age
    val fsPath = new org.apache.hadoop.fs.Path(s"$dir/inflight/part-000")
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(fsPath); out.write(9); out.close()
    // age the 'old' snapshot's commit marker past the cutoff
    val marker = new org.apache.hadoop.fs.Path(s"$dir/old/_SUCCESS")
    fs.setTimes(marker, System.currentTimeMillis() - 3600_000L, -1)
    val deleted = Checkpoint.clearStale(spark, dir, maxAgeMs = 60_000L)
    assert(deleted == Seq("old"), s"deleted $deleted")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/old")))
    assert(Checkpoint.committed(spark, s"$dir/fresh"), "fresh snapshot must survive")
    assert(fs.exists(fsPath), "in-flight stage dir must survive GC")
    // the expired stage recomputes on next use — GC is safe by design
    val computes = new AtomicInteger(0)
    Checkpoint.stage(spark, dir, "old") {
      computes.incrementAndGet(); KVS.generate(spark, Seq(("o", 1L)))
    }
    assert(computes.get() == 1)
  }

  test("PipeRun --ckpt: a rerun restores the mapper stage without re-reading the input") {
    val dir = freshDir("piperun")
    val work = java.nio.file.Files.createTempDirectory("piperun_in")
    val input = work.resolve("in.txt")
    java.nio.file.Files.writeString(input,
      "a 1\nb 2\na 3\nc 4\nb 5\n")
    def run() = graft.sources.PipeRun.run(spark, input.toString,
        Seq("cat"), Seq("awk", "{print $1, NF-1}"), Some(dir))
      .collect().sorted.toSeq
    val first = run()
    assert(first == Seq("a 2", "b 2", "c 1"))
    // destroy the input: a genuine resume must come from the snapshots,
    // never from re-piping the (now missing) source
    java.nio.file.Files.delete(input)
    val resumed = run()
    assert(resumed == first,
      "rerun with --ckpt must restore pipe stages, not re-read input")
  }

  test("describe lists a complete + torn snapshot pair (kmrckptdump parity)") {
    import spark.implicits._
    val dir = freshDir("describe")
    // committed stage with a known row count
    Checkpoint.stage(spark, dir, "good") {
      KVS.generate(spark, (0L until 42L).map(i => (s"k$i", i)))
    }
    // torn stage: data present, no _SUCCESS — the resume contract's
    // "recompute, don't trust" class; describe must report it without
    // attempting to decode the untrusted files
    val p = new org.apache.hadoop.fs.Path(s"$dir/torn/part-garbage.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p); out.write(Array[Byte](9, 9, 9)); out.close()

    val d = Checkpoint.describe(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(d.keySet == Set("good", "torn"))
    val good = d("good")
    assert(good.getBoolean(1), "committed stage must report committed=true")
    assert(good.getLong(2) >= 1 && good.getLong(3) > 0)
    assert(good.getLong(4) == 42L, s"row count must decode: $good")
    val torn = d("torn")
    assert(!torn.getBoolean(1), "torn stage must report committed=false")
    assert(torn.getLong(2) == 1 && torn.getLong(3) == 3)
    assert(torn.isNullAt(4), "torn snapshot must NOT report a row count")
    // empty/missing dir degrades to an empty listing, not an error
    assert(Checkpoint.describe(spark, freshDir("absent") + "/nope").count() == 0)
  }

  test("ckpt_resume gate query equals the straight-through computation") {
    val out = graft.SparkEntry.queries("ckpt_resume")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val direct = graft.Tables.load(spark, sfDir, "events")
      .select(org.apache.spark.sql.functions.col("event_type"),
        graft.Tables.cents.as("c"))
      .collect().filter(!_.isNullAt(1))
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    assert(out.toSeq == direct)
  }
}
