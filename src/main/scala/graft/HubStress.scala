package graft

import java.io.File
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

import graft.streaming.SseHub

/** Serving-layer stress at reference-breaking fan-out: ~500 concurrent
  * clients on ONE shared ingest query over a CHURNING bounded ring —
  * including deliberately stalled readers, the real production risk
  * (a wedged proxy holding a connection that never reads). HubBench
  * prices the happy path at 8 subscribers; this prices the contract
  * under hostile load:
  *
  *  - stalled readers overflow their own bounded queue and are marked
  *    dead (heap stays bounded; the serving layer disconnects them);
  *  - every DRAINING client's delivered set stays a contiguous
  *    gapless suffix of its route (verified per client at the end);
  *  - aggregate delivery throughput and time-to-head are recorded.
  *
  * The same invariants are CI-gated at this fan-out in SseHubSpec's
  * 500-client case; this main exists to put a NUMBER next to them.
  *
  * Run: sbt "runMain graft.HubStress" — prints one JSON line.
  * Knobs: HUB_STRESS_SUBS (default 500, of which 8% stalled),
  * HUB_STRESS_EVENTS (default 20000 churned events).
  */
object HubStress {

  private val NSubs = sys.env.getOrElse("HUB_STRESS_SUBS", "500").toInt
  private val NStalled = math.max(1, NSubs / 12)
  private val ChurnEvents = sys.env.getOrElse("HUB_STRESS_EVENTS", "20000").toInt
  private val Seed = 2000
  private val RingCap = 1024
  private val QueueCap = 4000
  private val T0 = 1705276800000000000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark) finally spark.stop()
  }

  private def writeEvents(spark: SparkSession, dst: File,
                          ids: Range, append: Boolean): Unit = {
    import spark.implicits._
    ids.map { i =>
      (i.toLong, T0 + i.toLong * 1000000L, i.toLong % 977,
        if (i % 2 == 0) "click" else "view", i * 1.5, s"""{"k":"$i"}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(2)
      .write.mode(if (append) "append" else "overwrite").parquet(dst.getPath)
  }

  def run(spark: SparkSession): Unit = {
    val base = Files.createTempDirectory("graft_hubstress").toFile
    val evDir = new File(base, "events.parquet")
    writeEvents(spark, evDir, 1 to Seed, append = false)
    val hub = new SseHub(spark, base.getPath, capacity = RingCap,
      maxQueuedFrames = QueueCap)
    hub.start()
    while (!hub.retainedRange.exists(_._2 >= Seed.toLong)) Thread.sleep(10)

    val lastId = Seed + ChurnEvents // even -> final click offset
    val idRe = "(?m)^id: (\\d+)$".r
    val nFast = NSubs - NStalled
    val delivered = new AtomicLong(0L)
    val fast = (1 to nFast).map { i =>
      val route = if (i % 2 == 0) "click" else "view"
      (hub.subscribe(route), route,
        new java.util.concurrent.ConcurrentLinkedQueue[Long]())
    }
    val stalled = (1 to NStalled).map(i =>
      hub.subscribe(if (i % 2 == 0) "click" else "view"))

    @volatile var stop = false
    val drainers = fast.map { case (sub, _, got) =>
      val t = new Thread(() => {
        def pump(): Unit = sub.drain().foreach { f =>
          delivered.incrementAndGet()
          idRe.findFirstMatchIn(f).foreach(m => got.add(m.group(1).toLong))
        }
        while (!stop) { pump(); Thread.sleep(2) }
        pump()
      })
      t.setDaemon(true); t.start(); t
    }

    // churn: the ring evicts ~ChurnEvents/RingCap times over while
    // every client is attached
    val tChurn = System.nanoTime()
    var next = Seed + 1
    while (next <= lastId) {
      writeEvents(spark, evDir, next to math.min(next + 999, lastId), append = true)
      next += 1000
      Thread.sleep(20)
    }
    def atHead: Boolean = fast.forall { case (_, route, got) =>
      got.contains(if (route == "click") lastId.toLong else lastId - 1L)
    }
    val deadline = System.currentTimeMillis() + 300000L
    while (!atHead && System.currentTimeMillis() < deadline) Thread.sleep(20)
    require(atHead, "fast readers never reached the head")
    val churnToHeadSec = (System.nanoTime() - tChurn) / 1e9
    stop = true
    drainers.foreach(_.join(10000L))

    // invariants (the SseHubSpec case, re-asserted on the priced run)
    val stalledOverflowed = stalled.count(_.overflowed)
    var gapless = true
    fast.foreach { case (sub, route, gotQ) =>
      require(!sub.overflowed, "draining reader overflowed")
      val got = { val b = scala.collection.mutable.ArrayBuffer.empty[Long]
        val it = gotQ.iterator(); while (it.hasNext) b += it.next(); b }
      val sorted = got.sorted
      val head = if (route == "click") lastId.toLong else lastId - 1L
      val want = sorted.head to head by 2L
      if (got.distinct.size != got.size || sorted != want.toBuffer) gapless = false
    }
    require(gapless, "a draining client's suffix had a hole or duplicate")
    hub.stop()

    val fps = delivered.get() / churnToHeadSec
    println(f"""{"metric":"hub_stress","n_subs":$NSubs,"n_stalled":$NStalled,"stalled_overflowed":$stalledOverflowed,"churn_events":$ChurnEvents,"ring_capacity":$RingCap,"delivered_frames":${delivered.get()},"fanout_frames_per_s":$fps%.0f,"churn_to_head_sec":$churnToHeadSec%.2f,"gapless_clients":$nFast}""")
  }
}
