package graft

import java.io.{BufferedReader, File, InputStreamReader}
import java.net.{HttpURLConnection, Socket, URL}
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import graft.streaming.SseHttpServer

/** The literal HTTP transport: real clients over a real socket —
  * /health, CORS, the 400 path, `:ok` preamble, catch-up + live tail
  * with route/since filters, latest-offset default, per-client
  * disconnect, `Last-Event-ID` resume, graceful shutdown
  * (service.go:74-119, 217-283).
  *
  * Streaming clients are RAW sockets speaking HTTP/1.0 (close-
  * delimited responses), not HttpURLConnection: the JDK client's
  * disconnect() drains the response toward EOF to recycle the
  * connection, and an SSE stream never ends — the server keeps
  * heartbeating, the drain keeps reading, and the "dropped" client
  * hangs forever (observed as a deadlocked suite). A hard
  * socket.close() is what a real dropped client looks like to the
  * server anyway: the next frame/heartbeat write fails and tears the
  * subscription down (service.go:272-274).
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

  /** Non-streaming endpoints (health/400/404) via HttpURLConnection. */
  private def get(port: Int, path: String,
                  headers: Seq[(String, String)] = Nil): HttpURLConnection = {
    val c = new URL(s"http://127.0.0.1:$port$path").openConnection()
      .asInstanceOf[HttpURLConnection]
    c.setConnectTimeout(5000)
    headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    c
  }

  /** Raw-socket SSE client: HTTP/1.0 request, background line reader,
    * HARD close (see class doc). */
  private final class SseClient(port: Int, path: String,
                                headers: Seq[(String, String)] = Nil) {
    private val socket = new Socket("127.0.0.1", port)
    socket.setSoTimeout(120000)
    locally {
      val os = socket.getOutputStream
      os.write((s"GET $path HTTP/1.0\r\nHost: 127.0.0.1\r\n" +
        headers.map { case (k, v) => s"$k: $v\r\n" }.mkString +
        "\r\n").getBytes("UTF-8"))
      os.flush()
    }
    val lines = new ConcurrentLinkedQueue[String]()
    val respHeaders = TrieMap.empty[String, String]
    @volatile var status: Int = -1
    private val reader = new Thread(() => {
      try {
        val br = new BufferedReader(
          new InputStreamReader(socket.getInputStream, "UTF-8"))
        val statusLine = br.readLine()
        var l = br.readLine()
        while (l != null && l.nonEmpty) { // response headers
          val i = l.indexOf(':')
          // lowercase keys: the JDK server normalizes names on the
          // wire ("Content-type"), and HTTP header names are
          // case-insensitive anyway
          if (i > 0) respHeaders.put(l.substring(0, i).trim.toLowerCase,
            l.substring(i + 1).trim)
          l = br.readLine()
        }
        // status published only after the headers are parsed, so an
        // awaitStatus() caller can assert on respHeaders race-free
        if (statusLine != null && statusLine.split(" ").length >= 2)
          status = statusLine.split(" ")(1).toInt
        if (l != null) { // body lines until close
          var b = br.readLine()
          while (b != null) { lines.add(b); b = br.readLine() }
        }
      } catch { case _: Exception => () }
    })
    reader.setDaemon(true)
    reader.start()
    def awaitStatus(timeoutMs: Long = 10000L): Int = {
      val dl = System.currentTimeMillis() + timeoutMs
      while (status == -1 && System.currentTimeMillis() < dl) Thread.sleep(20)
      status
    }
    def has(i: Int): Boolean = lines.asScala.exists(_.contains(s""""k":"$i""""))
    def ids: Set[Long] = lines.asScala
      .filter(_.startsWith("id: ")).map(_.stripPrefix("id: ").toLong).toSet
    /** The drop: hard socket close — the server's next write fails. */
    def close(): Unit = try socket.close() catch { case _: Exception => () }
  }

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
      val c = new SseClient(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
      assert(c.awaitStatus() == 200)
      assert(c.respHeaders.get("content-type").exists(_.startsWith("text/event-stream")))
      assert(c.respHeaders.get("access-control-allow-origin").contains("*"))
      // catch-up: clicks 2 and 4 exist at connect time
      assert(eventually()(c.has(2) && c.has(4)), "catch-up frames missing")
      assert(c.lines.asScala.head == ":ok", "missing :ok preamble")
      // live tail: appended clicks stream to the open connection
      writeEvents(evDir, 6 to 10, append = true)
      assert(eventually()(c.has(6) && c.has(8) && c.has(10)), "tail frames missing")
      // route filter: view events never cross this route's stream
      for (i <- Seq(1, 3, 5, 7, 9))
        assert(!c.has(i), s"view event $i leaked into /routes/click")
      c.close()
    }
  }

  test("absent since resumes at the latest offset (pure live tail)") {
    withServer { (srv, evDir) =>
      val c = new SseClient(srv.boundPort, "/routes/click")
      assert(c.awaitStatus() == 200)
      assert(eventually()(c.lines.asScala.nonEmpty), "no preamble") // :ok
      writeEvents(evDir, 6 to 8, append = true)
      assert(eventually()(c.has(6) && c.has(8)), "tail frames missing")
      // nothing from before the connect was replayed
      assert(!c.has(2) && !c.has(4), "historical frames leaked")
      c.close()
    }
  }

  test("client disconnect tears down only that client's query") {
    withServer { (srv, _) =>
      val cA = new SseClient(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
      val cB = new SseClient(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
      assert(eventually()(srv.activeClients == 2), "clients never attached")
      cA.close()
      // the idle-heartbeat write notices the dead socket and reaps A
      assert(eventually()(srv.activeClients == 1), "disconnect not detected")
      assert(eventually()(cB.has(2)), "surviving client lost its stream")
      cB.close()
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
      val cA = new SseClient(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
      val cB = new SseClient(srv.boundPort, "/routes/click?since=2024-01-15T00:00:07Z")
      assert(eventually()(srv.activeClients == 2), "clients never attached")
      // the whole point: one streaming query for any number of clients
      assert(spark.streams.active.length <= before + 1,
        s"shared mode started ${spark.streams.active.length - before} queries")
      assert(eventually()(cA.has(2) && cA.has(4) && cA.has(10)),
        "client A window incomplete")
      // B's instant resolves to the nearest offset at/after 07s: clicks 8, 10
      assert(eventually()(cB.has(8) && cB.has(10)), "client B window incomplete")
      assert(!cB.has(6), "client B replayed before its seek")
      writeEvents(new File(base, "events.parquet"), 11 to 12, append = true)
      assert(eventually()(cA.has(12) && cB.has(12)), "shared tail not fanned out")
      cA.close(); cB.close()
      assert(eventually()(srv.activeClients == 0), "disconnects not reaped")
    } finally srv.stop()
  }

  test("Last-Event-ID resume: a dropped client reconnects and receives exactly the missed frames") {
    withServer { (srv, evDir) =>
      // first connection: catch-up delivers clicks 2 and 4, each frame
      // preceded by its SSE id line (id == event_id == offset)
      val c1 = new SseClient(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
      assert(eventually()(c1.has(2) && c1.has(4)), "catch-up frames missing")
      assert(c1.ids == Set(2L, 4L),
        s"frames must carry their offsets as SSE ids: ${c1.ids}")
      c1.close() // the drop
      // events land while the client is away
      writeEvents(evDir, 6 to 10, append = true)
      // reconnect with the last id it saw: exactly the missed clicks
      val c2 = new SseClient(srv.boundPort,
        "/routes/click?since=2024-01-15T00:00:00Z",
        headers = Seq("Last-Event-ID" -> "4"))
      assert(c2.awaitStatus() == 200)
      assert(eventually()(c2.has(6) && c2.has(8) && c2.has(10)),
        "missed frames not replayed")
      assert(!c2.has(2) && !c2.has(4),
        "frames before Last-Event-ID re-delivered (header must win over since)")
      assert(!c2.has(7) && !c2.has(9), "route filter lost on resume")
      c2.close()
      // malformed header answers 400 before any query runs
      val c3 = get(srv.boundPort, "/routes/click",
        headers = Seq("Last-Event-ID" -> "not-an-offset"))
      assert(c3.getResponseCode == 400)
    }
  }

  test("Last-Event-ID resume in shared hub mode") {
    val base = Files.createTempDirectory("graft_http_lei").toFile
    writeEvents(new File(base, "events.parquet"), 1 to 6, append = false)
    val srv = new graft.streaming.SseHttpServer(spark, base.getPath,
      heartbeatMs = 200L, shared = true)
    srv.start()
    try {
      val c1 = new SseClient(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
      assert(eventually()(c1.has(2) && c1.has(4) && c1.has(6)))
      assert(c1.ids == Set(2L, 4L, 6L))
      c1.close()
      writeEvents(new File(base, "events.parquet"), 7 to 10, append = true)
      val c2 = new SseClient(srv.boundPort, "/routes/click",
        headers = Seq("Last-Event-ID" -> "6"))
      assert(eventually()(c2.has(8) && c2.has(10)),
        "hub replay from Last-Event-ID incomplete")
      assert(!c2.has(2) && !c2.has(4) && !c2.has(6),
        "hub re-delivered frames at/before Last-Event-ID")
      c2.close()
    } finally srv.stop()
  }

  test("shared mode: Last-Event-ID wins over since (header precedence matrix)") {
    // the per-client mode's precedence case lives in the reconnect test
    // above (c2 sends BOTH since=T0 and Last-Event-ID: 4 and must not
    // see 2/4); this is the same matrix cell for the hub serving mode
    val base = Files.createTempDirectory("graft_http_prec").toFile
    writeEvents(new File(base, "events.parquet"), 1 to 10, append = false)
    val srv = new graft.streaming.SseHttpServer(spark, base.getPath,
      heartbeatMs = 200L, shared = true)
    srv.start()
    try {
      // since=T0 alone would replay clicks 2..10; the header must win
      // and deliver strictly after offset 6 only
      val c = new SseClient(srv.boundPort,
        "/routes/click?since=2024-01-15T00:00:00Z",
        headers = Seq("Last-Event-ID" -> "6"))
      assert(c.awaitStatus() == 200)
      assert(eventually()(c.has(8) && c.has(10)), "post-header frames missing")
      assert(!c.has(2) && !c.has(4) && !c.has(6),
        "header did not win over since in shared mode")
      c.close()
      // malformed header answers 400 in shared mode too, before any
      // hub subscription is created
      val bad = get(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z",
        headers = Seq("Last-Event-ID" -> "4; DROP TABLE"))
      assert(bad.getResponseCode == 400)
    } finally srv.stop()
  }

  test("Last-Event-ID beyond ring eviction resumes from the oldest retained offset") {
    // memlog semantics (service.go:101, memlog.WithMaxSegmentSize): a
    // seek before the oldest retained offset replays only what capacity
    // kept — never an error, never a duplicate of evicted history
    val base = Files.createTempDirectory("graft_http_evict").toFile
    writeEvents(new File(base, "events.parquet"), 1 to 10, append = false)
    val srv = new graft.streaming.SseHttpServer(spark, base.getPath,
      heartbeatMs = 200L, shared = true, hubCapacity = 2)
    srv.start()
    try {
      // clicks 2,4,6,8,10 ingested; route ring (capacity 2) retains 8,10.
      // A client that saw offset 2 before a long outage reconnects:
      val c = new SseClient(srv.boundPort, "/routes/click",
        headers = Seq("Last-Event-ID" -> "2"))
      assert(c.awaitStatus() == 200)
      assert(eventually()(c.has(8) && c.has(10)),
        "retained frames after the evicted seek not replayed")
      assert(!c.has(4) && !c.has(6),
        "evicted frames re-delivered (capacity must bound replay)")
      // live frames still follow the truncated replay
      writeEvents(new File(base, "events.parquet"), 11 to 12, append = true)
      assert(eventually()(c.has(12)), "live tail lost after evicted-seek replay")
      c.close()
    } finally srv.stop()
  }

  test("stop() is graceful: client queries stopped, listener closed") {
    val base = Files.createTempDirectory("graft_http2").toFile
    writeEvents(new File(base, "events.parquet"), 1 to 5, append = false)
    val srv = new graft.streaming.SseHttpServer(spark, base.getPath,
      heartbeatMs = 200L)
    srv.start()
    val before = spark.streams.active.length
    val c = new SseClient(srv.boundPort, "/routes/click?since=2024-01-15T00:00:00Z")
    assert(eventually()(srv.activeClients == 1))
    srv.stop()
    assert(eventually()(srv.activeClients == 0), "clients survived stop()")
    assert(eventually()(spark.streams.active.length <= before),
      "streaming queries survived stop()")
    c.close()
    intercept[Exception] {
      val c2 = get(srv.boundPort, "/health")
      c2.setReadTimeout(2000)
      c2.getResponseCode
    }
  }
}
