package graft.core

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Simple-workflow lane scheduler — kmr_map_swf parity
  * (src/kmrwfmap.c:4-41 for the model, kmr_init_swf:528,
  * kmr_split_swf_lanes:1067, kmr_map_swf:2112).
  *
  * Reference model: ranks are grouped into hierarchical lanes of at most
  * four levels, addressed like (0.1.2); each lane holds a FIFO queue of
  * work-items; a work-item entered in a lane RUNS USING ALL SUBLANES
  * BELOW IT, and a single master tracks running/idle lanes. The
  * scheduling is explicit; data-flow is implicit.
  *
  * Spark-first re-expression: a lane's "ranks" are a share of the
  * executor pool, so a work-item is a driver-side job (actions on
  * DataFrames) and the lane tree is an admission-control policy OVER
  * Spark's scheduler, not a replacement for it:
  *
  *  - FIFO per lane: only the head of each lane's queue is eligible —
  *    exactly the reference's per-lane FIFO.
  *  - "uses all sublanes below it": a running item excludes the whole
  *    ancestor-or-descendant chain of its lane (an item on (0) needs
  *    (0.0) and (0.1)'s resources; an item on (0.0) makes (0) partly
  *    busy), while disjoint subtrees — (0.0) vs (0.1), (0) vs (1) —
  *    admit in parallel. This is the subworld-communicator exclusion
  *    expressed over a shared cluster.
  *  - the "master" is this dispatcher; each admitted item runs in its
  *    own thread with `spark.scheduler.pool` set to its lane address,
  *    so under FAIR scheduling concurrent lanes also get fair executor
  *    shares (under default FIFO the property is advisory — admission
  *    control above still enforces the lane semantics).
  *
  * Failure contract: the first failing work-item cancels everything
  * still pending, running items drain, and the failure is rethrown —
  * the workflow never silently continues past a dead step (the
  * reference aborts the workflow on a spawned-job failure).
  *
  * Scale shape: the dispatcher holds only queue metadata; all data
  * motion stays inside the work-items' Spark jobs. Lane count is
  * user-chosen and small (the reference caps the tree at 4 levels);
  * admission decisions are O(lanes) per completion.
  */
object Lanes {

  import scala.jdk.CollectionConverters._

  /** One work-item: enqueue into `lane` ("0", "0.1", up to 4 levels),
    * run `body` when admitted. */
  final case class Item[T](lane: String, name: String, body: () => T)

  /** Dispatch trace for one completed item: [startSeq, endSeq] are
    * ticks of one monotonic counter shared by all items — the spec's
    * evidence for FIFO order, exclusion, and parallelism. */
  final case class Trace(name: String, lane: String, startSeq: Int, endSeq: Int)

  private val LaneRe = "^\\d+(\\.\\d+){0,3}$".r

  def validateLane(lane: String): Unit =
    require(LaneRe.matches(lane),
      s"lane '$lane' is not a dotted address of at most 4 levels (kmrwfmap.c:60)")

  /** Ancestor-or-equal-or-descendant: the pair cannot run together. */
  def conflicts(a: String, b: String): Boolean =
    a == b || a.startsWith(b + ".") || b.startsWith(a + ".")

  /** Run all items under lane admission control; returns results in
    * SUBMISSION order plus the dispatch trace. `width` bounds how many
    * items run concurrently (the farm width, like the lane split's rank
    * count). */
  def run[T](spark: SparkSession, items: Seq[Item[T]], width: Int = 8)
      : (Vector[T], Vector[Trace]) = {
    items.foreach(i => validateLane(i.lane))
    val n = items.size
    val results = new Array[Any](n)
    val traces = new ConcurrentLinkedQueue[(Int, Trace)]()
    val seq = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(math.max(1, width))
    val lock = new Object
    // per-lane FIFO queues in submission order
    val queues = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.Queue[Int]]
    items.zipWithIndex.foreach { case (it, i) =>
      queues.getOrElseUpdate(it.lane, scala.collection.mutable.Queue.empty) += i
    }
    val running = scala.collection.mutable.Set.empty[String] // lanes in flight
    var inFlight = 0
    @volatile var failure: Throwable = null
    val done = new CountDownLatch(1)

    def dispatch(): Unit = lock.synchronized {
      if (failure != null) queues.values.foreach(_.clear())
      // admit every eligible queue head (an admitted lane immediately
      // conflicts with itself, so each lane contributes at most one)
      var admitted = true
      while (admitted) {
        admitted = false
        queues.find { case (lane, q) =>
          q.nonEmpty && !running.exists(r => conflicts(r, lane))
        } match {
          case Some((lane, q)) =>
            val idx = q.dequeue()
            running += lane
            inFlight += 1
            admitted = true
            val it = items(idx)
            pool.execute(() => {
              val start = seq.getAndIncrement()
              try {
                // lane address = scheduler pool: under FAIR mode
                // concurrent lanes share executors fairly; the property
                // is per-thread so it needs no cleanup beyond the task
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", "lane_" + it.lane)
                spark.sparkContext.setJobDescription(s"swf ${it.name} @ lane ${it.lane}")
                results(idx) = it.body()
              } catch {
                case t: Throwable => lock.synchronized { if (failure == null) failure = t }
              } finally {
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
                traces.add((idx, Trace(it.name, it.lane, start, seq.getAndIncrement())))
                lock.synchronized { running -= it.lane; inFlight -= 1 }
                dispatch()
              }
            })
          case None => ()
        }
      }
      if (inFlight == 0 && queues.values.forall(_.isEmpty)) done.countDown()
    }

    dispatch()
    done.await()
    pool.shutdown()
    pool.awaitTermination(60, TimeUnit.SECONDS)
    if (failure != null)
      throw new RuntimeException(s"swf work-item failed; workflow aborted", failure)
    val tr = traces.asScala.toVector.sortBy(_._1).map(_._2)
    (results.toVector.map(_.asInstanceOf[T]), tr)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- The workflow as a census gate: a two-level lane tree where
    // each leaf lane's work-item is a real executed Spark job (an
    // aggregate over its o_custkey slice, collected inside the item),
    // followed by a root-lane item that runs only after its subtree
    // drained (FIFO + subtree exclusion) and folds the leaves' rows
    // into the final frame. Scheduling must not change the answer —
    // the oracle recomputes the same slices declaratively.
    QueryDef("swf_lanes", (s, d) => {
      import s.implicits._
      val orders = Tables.load(s, d, "orders")
        .select(pmod(col("o_custkey"), lit(4L)).as("slice"),
          col("o_orderstatus"), col("o_totalprice"))
      val leafRows = new ConcurrentLinkedQueue[Row]()
      val leaves = (0 until 4).map { l =>
        Item[Unit](lane = s"0.${l / 2}.${l % 2}", name = s"slice$l", body = () => {
          orders.filter(col("slice") === l)
            .groupBy("o_orderstatus")
            .agg(count(lit(1)).as("cnt"),
              sum(expr("try_cast(round(o_totalprice * 100, 0) AS LONG)")).as("price_cents"))
            .collect()
            .foreach(r => leafRows.add(Row(l.toLong, r.getString(0), r.getLong(1), r.getLong(2))))
        })
      }
      // the root item needs lanes 0.* idle — it observes every leaf done
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      val root = Item[Unit]("0", "fold", () => { out ++= leafRows.asScala })
      Lanes.run(s, leaves :+ root, width = 8)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("slice", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_orderstatus", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("price_cents", org.apache.spark.sql.types.LongType)))
      s.createDataFrame(new java.util.ArrayList[Row](out.asJava), schema)
        .orderBy("slice", "o_orderstatus")
    }, Some(
      "SELECT o_custkey % 4 AS slice, o_orderstatus, count(*) AS cnt, " +
      "CAST(sum(TRY_CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS price_cents " +
      "FROM orders GROUP BY 1, 2 ORDER BY slice, o_orderstatus"))
  )
}
