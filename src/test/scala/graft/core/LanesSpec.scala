package graft.core

import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.SparkSuite
import graft.core.Lanes.{Item, Trace}

/** kmr_map_swf lane semantics (src/kmrwfmap.c:4-41): FIFO per lane,
  * subtree exclusion (an item uses all sublanes below its lane),
  * sibling parallelism, ≤4-level addresses, and the abort-on-failure
  * contract. Parallelism proofs are latch-based (deterministic), not
  * sleep-based. */
class LanesSpec extends SparkSuite {

  private def overlap(a: Trace, b: Trace): Boolean =
    a.startSeq < b.endSeq && b.startSeq < a.endSeq

  test("work-items in one lane run in FIFO submission order, never " +
      "overlapping") {
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val items = (0 until 5).map(i =>
      Item[Int]("2.1", s"it$i", () => { order.add(i); i * 10 }))
    val (results, traces) = Lanes.run(spark, items, width = 8)
    assert(results == (0 until 5).map(_ * 10).toVector)
    assert(order.toArray.toSeq == (0 until 5), "FIFO start order")
    traces.sliding(2).foreach { case Seq(a, b) =>
      assert(!overlap(a, b), s"$a overlaps $b in one lane")
      assert(a.endSeq < b.startSeq, "strict FIFO completion before next start")
    case _ => ()
    }
  }

  test("a parent-lane item excludes its whole subtree, while disjoint " +
      "subtrees admit in parallel") {
    // parallelism proof: the two sibling-subtree items each await the
    // other's start — they deadlock (and time out) unless admitted
    // concurrently
    val both = new CountDownLatch(2)
    def sibling(lane: String) = Item[Boolean](lane, s"sib$lane", () => {
      both.countDown()
      both.await(30, TimeUnit.SECONDS)
    })
    val items = Seq(
      Item[Boolean]("0", "parent", () => true), // holds (0) first: subtree idle-wait
      sibling("0.0"), sibling("0.1"))
    val (results, traces) = Lanes.run(spark, items, width = 8)
    assert(results == Vector(true, true, true),
      "siblings must have started concurrently (latch satisfied)")
    val Seq(p, s0, s1) = traces
    assert(!overlap(p, s0) && !overlap(p, s1),
      "parent (0) item must not overlap items in its sublanes")
    assert(overlap(s0, s1), "disjoint sublanes (0.0)/(0.1) ran in parallel")
  }

  test("items on unrelated top-level lanes run in parallel; an ancestor " +
      "queued BEHIND a running descendant waits for it") {
    val both = new CountDownLatch(2)
    def top(lane: String) = Item[Boolean](lane, s"top$lane", () => {
      both.countDown(); both.await(30, TimeUnit.SECONDS)
    })
    val items = Seq(
      top("3.0"), top("4"),      // parallel pair
      Item[Boolean]("3", "anc", () => true)) // needs (3.*) idle
    val (results, traces) = Lanes.run(spark, items, width = 8)
    assert(results.forall(_ == true))
    val Seq(d, t, anc) = traces
    assert(overlap(d, t), "lanes (3.0) and (4) are disjoint — parallel")
    assert(!overlap(anc, d), "ancestor (3) excluded while (3.0) runs")
  }

  test("lane addresses are validated: 4 levels ok, 5 rejected, " +
      "non-numeric rejected") {
    Lanes.validateLane("0.1.2.3")
    intercept[IllegalArgumentException] { Lanes.validateLane("0.1.2.3.4") }
    intercept[IllegalArgumentException] { Lanes.validateLane("a.b") }
    assert(Lanes.conflicts("0", "0.1.2") && Lanes.conflicts("0.1.2", "0")
      && Lanes.conflicts("1", "1") && !Lanes.conflicts("0.1", "0.2")
      && !Lanes.conflicts("1", "10")) // dotted levels, not string prefixes
  }

  test("a failing work-item aborts the workflow: pending items are " +
      "cancelled and the failure surfaces") {
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val items = Seq(
      Item[Unit]("0", "ok", () => { ran.incrementAndGet(); () }),
      Item[Unit]("0", "boom", () => sys.error("step died")),
      Item[Unit]("0", "after", () => { ran.incrementAndGet(); () }))
    val e = intercept[RuntimeException] { Lanes.run(spark, items, width = 2) }
    assert(e.getCause.getMessage.contains("step died"))
    assert(ran.get() == 1, "items queued behind the failure must not run")
  }

  test("work-items drive REAL Spark jobs under their lane (the gate's " +
      "shape): results equal the declarative equivalent") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables.load(spark, sfDir, "orders")
    val expected = df.count()
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val items = (0 until 2).map(l => Item[Unit](s"$l", s"cnt$l", () => {
      counts.add(df.filter(pmod(col("o_orderkey"), lit(2L)) === l).count()); ()
    }))
    Lanes.run(spark, items, width = 4)
    assert(counts.toArray.map(_.asInstanceOf[Long]).sum == expected)
  }
}
