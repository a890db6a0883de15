package graft

import org.apache.spark.sql.functions._
import graft.streaming.SseSink

/** A11: SSE serving sink (ForeachWriter) frames match the reference's
  * `data: <json>\n\n` format and the batch projection. */
class SseSinkSpec extends SparkSpec {

  test("streamed SSE frames equal the batch frame projection") {
    val runId = "sse_" + System.nanoTime()
    SseSink.serve(spark, sfDir, new SseSink.InMemory(runId))
    val streamed = SseSink.InMemoryTransport.frames(runId)
    SseSink.InMemoryTransport.clear(runId)

    val batch = graft.operators.EventLogOps.sseFrames(spark, sfDir)
      .select("frame").collect().map(_.getString(0))
    assert(streamed.size == batch.length)
    assert(streamed.toSet == batch.toSet)
    val f = streamed.head
    assert(f.startsWith("data: {\"time\":\"") && f.endsWith("}\n\n"),
      s"bad frame: $f")
  }
}
