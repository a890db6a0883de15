package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.streaming.SseHub

/** Measures the shared-query serving path END TO END — file source →
  * streaming query → per-route ring → N subscriber queues — so
  * BASELINE.md's serving claim rests on a number, not on the batch
  * parse rate alone. Three figures, mirroring how the reference's
  * ingest bar (~250-500k events/s/shard, BASELINE.md) is stated:
  *
  *  1. ingest: events/s from cold start until every event of a bulk
  *     corpus is retained in the rings (query + append path);
  *  2. fan-out: frames/s delivered draining N concurrent subscribers
  *     that each replay the full retained history;
  *  3. live latency: file-append → subscriber-poll wall latency over
  *     repeated small batches (dominated by the micro-batch trigger,
  *     so reported against the configured poll interval).
  *
  * Run: sbt "runMain graft.HubBench" — prints one JSON line.
  */
object HubBench {

  private val NEvents =
    sys.env.getOrElse("HUB_BENCH_EVENTS", "200000").toInt
  private val NSubs = 8
  private val LiveRounds = 20
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
      .coalesce(4)
      .write.mode(if (append) "append" else "overwrite").parquet(dst.getPath)
  }

  def run(spark: SparkSession): Unit = {
    val base = Files.createTempDirectory("graft_hubbench").toFile
    val evDir = new File(base, "events.parquet")
    writeEvents(spark, evDir, 1 until NEvents + 1, append = false)

    // 1. ingest: cold start -> all NEvents retained across both rings
    val hub = new SseHub(spark, base.getPath, capacity = NEvents + LiveRounds + 10)
    val tStart = System.nanoTime()
    hub.start()
    while (!hub.retainedRange.exists(_._2 >= NEvents.toLong)) Thread.sleep(10)
    val ingestSec = (System.nanoTime() - tStart) / 1e9
    val ingestEps = NEvents / ingestSec

    // 2. fan-out: N subscribers replay the full history concurrently
    val subs = (1 to NSubs).map(i =>
      hub.subscribe(if (i % 2 == 0) "click" else "view"))
    val tFan = System.nanoTime()
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val threads = subs.map(s => new Thread(() => { total.addAndGet(s.drain().size.toLong); () }))
    threads.foreach(_.start()); threads.foreach(_.join())
    val counts = total.get()
    val fanSec = (System.nanoTime() - tFan) / 1e9
    val fanFps = counts / fanSec

    // 3. live latency: append a marker file, poll one click + one view
    // subscriber until the marker lands in both
    val clickSub = subs(1); val viewSub = subs(0)
    val lats = (1 to LiveRounds).map { r =>
      val idA = NEvents + 2 * r - 1 // view (odd)
      val idB = NEvents + 2 * r     // click (even)
      val tW = System.nanoTime()
      writeEvents(spark, evDir, idA to idB, append = true)
      def seen(sub: SseHub.Subscription, id: Int): Boolean =
        sub.drain().exists(_.contains(s""""k":"$id""""))
      var a = false; var b = false
      while (!(a && b)) {
        if (!a) a = seen(viewSub, idA)
        if (!b) b = seen(clickSub, idB)
        if (!(a && b)) Thread.sleep(2)
      }
      (System.nanoTime() - tW) / 1e6
    }.sorted
    val p50 = lats(LiveRounds / 2)
    // nearest-rank p95: ceil(0.95·n) as a 1-based rank → index 18 of
    // 20, NOT (n·0.95).toInt = 19, which is the MAXIMUM for n=20
    val p95 = lats(math.ceil(LiveRounds * 0.95).toInt - 1)
    hub.stop()

    println(f"""{"metric":"hub_throughput","ingest_events_per_s":${ingestEps}%.0f,"ingest_sec":${ingestSec}%.3f,"n_events":$NEvents,"fanout_frames_per_s":${fanFps}%.0f,"fanout_frames":$counts,"n_subs":$NSubs,"live_latency_ms_p50":${p50}%.1f,"live_latency_ms_p95":${p95}%.1f,"poll_interval_ms":100}""")
  }
}
