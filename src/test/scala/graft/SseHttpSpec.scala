package graft

import java.io.{BufferedReader, File, InputStreamReader}
import java.net.{HttpURLConnection, URL}
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import graft.streaming.SseHttpServer

/** The literal HTTP transport: real clients over a real socket —
  * /health, CORS, the 400 path, `:ok` preamble, catch-up + live tail
  * with route/since filters, latest-offset default, per-client
  * disconnect, graceful shutdown (service.go:74-119, 217-283).
  */
class SseHttpSpec extends SparkSpec {

  private val T0 = 1705276800000000000L

  private def writeEvents(dst: File, ids: Range, append: Boolean): Unit = {
    import spark.implicits._
    val rows = ids.map { i =>
      (i.toLong, T0 + i.toLong * 1000000000L, i.toLong % 7,
        if (i % 2 == 0) "click" else "view", i * 1.5, s"""{"k":"$i"}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode(if (append) "append" else "overwrite").parquet(dst.getPath)
  }

  private def eventually(timeoutMs: Long = 60000L)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(100)
    }
    cond
  }

  private def withServer(f: (SseHttpServer, File) => Unit): Unit = {
    val base = Files.createTempDirectory("graft_http").toFile
    writeEvents(new File(base, "events.parquet"), 1 to 5, append = false)
    val srv = new graft.streaming.SseHttpServer(spark, base.getPath,
      heartbeatMs = 200L)
    srv.start()
    try f(srv, new File(base, "events.parquet"))
    finally srv.stop()
  }

  private def get(port: Int, path: String): HttpURLConnection = {
    val c = new URL(s"http://127.0.0.1:$port$path").openConnection()
      .asInstanceOf[HttpURLConnection]
    c.setConnectTimeout(5000)
    c
  }

  /** Background line reader for an open SSE response. */
  private def readLines(c: HttpURLConnection): ConcurrentLinkedQueue[String] = {
    val lines = new ConcurrentLinkedQueue[String]()
    val t = new Thread(() => {
      try {
        val br = new BufferedReader(new InputStreamReader(c.getInputStream, "UTF-8"))
        var l = br.readLine()
        while (l != null) { lines.add(l); l = br.readLine() }
      } catch { case _: Exception => () }
    })
    t.setDaemon(true)
    t.start()
    lines
  }

  private def has(lines: ConcurrentLinkedQueue[String], i: Int): Boolean =
    lines.asScala.exists(_.contains(s""""k":"$i""""))

  test("GET /health answers 200 with CORS") {
    withServer { (srv, _) =>
      val c = get(srv.boundPort, "/health")
      assert(c.getResponseCode == 200)
      assert(c.getHeaderField("Access-Control-Allow-Origin") == "*")
    }
  }

  test("malformed since answers 400 before any query runs") {
    withServer { (srv, _) =>
      val c = get(srv.boundPort, "/routes/click?since=yesterday")
      assert(c.getResponseCode == 400)
      assert(srv.activeClients == 0)
      assert(get(srv.boundPort, "/routes/").getResponseCode == 404)
    }
  }

  test("SSE stream: :ok preamble, catch-up from since, route filter, live tail") {
    withServer { (srv, evDir) =>
      val c = get(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
      val lines = readLines(c)
      assert(c.getResponseCode == 200)
      assert(c.getHeaderField("Content-Type").startsWith("text/event-stream"))
      assert(c.getHeaderField("Access-Control-Allow-Origin") == "*")
      // catch-up: clicks 2 and 4 exist at connect time
      assert(eventually()(has(lines, 2) && has(lines, 4)), "catch-up frames missing")
      assert(lines.asScala.head == ":ok", "missing :ok preamble")
      // live tail: appended clicks stream to the open connection
      writeEvents(evDir, 6 to 10, append = true)
      assert(eventually()(has(lines, 6) && has(lines, 8) && has(lines, 10)),
        "tail frames missing")
      // route filter: view events never cross this route's stream
      for (i <- Seq(1, 3, 5, 7, 9))
        assert(!has(lines, i), s"view event $i leaked into /routes/click")
      c.disconnect()
    }
  }

  test("absent since resumes at the latest offset (pure live tail)") {
    withServer { (srv, evDir) =>
      val c = get(srv.boundPort, "/routes/click")
      val lines = readLines(c)
      assert(c.getResponseCode == 200)
      assert(eventually()(lines.asScala.nonEmpty), "no preamble") // :ok
      writeEvents(evDir, 6 to 8, append = true)
      assert(eventually()(has(lines, 6) && has(lines, 8)), "tail frames missing")
      // nothing from before the connect was replayed
      assert(!has(lines, 2) && !has(lines, 4), "historical frames leaked")
      c.disconnect()
    }
  }

  test("client disconnect tears down only that client's query") {
    withServer { (srv, _) =>
      val cA = get(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
      val cB = get(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
      val linesB = readLines(cB)
      readLines(cA)
      assert(eventually()(srv.activeClients == 2), "clients never attached")
      cA.disconnect()
      // the idle-heartbeat write notices the dead socket and reaps A
      assert(eventually()(srv.activeClients == 1), "disconnect not detected")
      assert(eventually()(has(linesB, 2)), "surviving client lost its stream")
      cB.disconnect()
    }
  }

  test("shared mode: many HTTP clients ride ONE hub query, seeks resolved to offsets") {
    val base = Files.createTempDirectory("graft_http_hub").toFile
    writeEvents(new File(base, "events.parquet"), 1 to 10, append = false)
    val srv = new graft.streaming.SseHttpServer(spark, base.getPath,
      heartbeatMs = 200L, shared = true)
    srv.start()
    try {
      val before = spark.streams.active.length
      val cA = get(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
      val linesA = readLines(cA)
      val cB = get(srv.boundPort, "/routes/click?since=2024-01-15T00:00:07Z")
      val linesB = readLines(cB)
      assert(eventually()(srv.activeClients == 2), "clients never attached")
      // the whole point: one streaming query for any number of clients
      assert(spark.streams.active.length <= before + 1,
        s"shared mode started ${spark.streams.active.length - before} queries")
      assert(eventually()(has(linesA, 2) && has(linesA, 4) && has(linesA, 10)),
        "client A window incomplete")
      // B's instant resolves to the nearest offset at/after 07s: clicks 8, 10
      assert(eventually()(has(linesB, 8) && has(linesB, 10)), "client B window incomplete")
      assert(!has(linesB, 6), "client B replayed before its seek")
      writeEvents(new File(base, "events.parquet"), 11 to 12, append = true)
      assert(eventually()(has(linesA, 12) && has(linesB, 12)), "shared tail not fanned out")
      cA.disconnect(); cB.disconnect()
      assert(eventually()(srv.activeClients == 0), "disconnects not reaped")
    } finally srv.stop()
  }

  test("stop() is graceful: client queries stopped, listener closed") {
    val base = Files.createTempDirectory("graft_http2").toFile
    writeEvents(new File(base, "events.parquet"), 1 to 5, append = false)
    val srv = new graft.streaming.SseHttpServer(spark, base.getPath,
      heartbeatMs = 200L)
    srv.start()
    val before = spark.streams.active.length
    val c = get(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
    readLines(c)
    assert(eventually()(srv.activeClients == 1))
    srv.stop()
    assert(eventually()(srv.activeClients == 0), "clients survived stop()")
    assert(eventually()(spark.streams.active.length <= before),
      "streaming queries survived stop()")
    intercept[Exception] {
      val c2 = get(srv.boundPort, "/health")
      c2.setReadTimeout(2000)
      c2.getResponseCode
    }
  }
}
