package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Structured Streaming ingest over the events table — the Spark
  * realization of the reference's KCL worker loop
  * (/root/reference/internal/kinesis2sse/service.go:133-141): a file
  * source stands in for the Kinesis shards (same micro-batch pull
  * model), with an explicit schema (required by streaming sources) and
  * AvailableNow termination so batch oracles can verify the result.
  *
  * At scale the file source is swapped for a real Kinesis/Kafka source
  * with identical downstream plan: watermark → tumbling window →
  * partial-agg shuffle on (window, route). State is bounded by the
  * watermark; each micro-batch shuffles only its own partial
  * aggregates.
  */
object EventStreams {

  /** Streaming events: file source with the pinned schema, ts exposed
    * both raw (nanos) and as a µs timestamp for watermarking. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Tables.eventsRawSchema)
      // the file stream source watches a DIRECTORY; select just the
      // events table out of the shared sf dir
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_us", timestamp_micros(expr("ts DIV 1000")))

  private val D = DecimalType(18, 2)

  /** A9: streaming tumbling-window counts per route, run to completion
    * with AvailableNow and returned as a batch DataFrame (complete
    * output mode — all data is historical, so the final state equals
    * the batch answer and the DuckDB oracle can verify it). */
  def windowCounts(spark: SparkSession, dir: String): DataFrame = {
    val name = "wc_" + UUID.randomUUID().toString.replace("-", "")
    val agg = readEvents(spark, dir)
      .groupBy(window(col("ts_us"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D)).cast("double").as("total_value"))
    val q = agg.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start_us", "event_type")
  }

  val windowCountsSql: String =
    """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS window_start_us,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start_us, event_type""".stripMargin
}
