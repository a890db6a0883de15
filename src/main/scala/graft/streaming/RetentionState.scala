package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A10: stateful bounded event log, keyed by route — the Spark
  * realization of the reference's per-route memlog + Timestamp2Offset
  * pair (/root/reference/internal/kinesis2sse/service.go:59-63,
  * 92-128): each route keeps the newest `capacity` events by offset,
  * older entries evicted, queryable by event time.
  *
  * State is explicitly bounded: the fold keeps at most `capacity`
  * entries per route at all times (never materializing a batch's full
  * group), so executor memory is O(routes × capacity) regardless of
  * input volume.
  */
object RetentionState {

  case class Ev(route: String, offset: Long, us: Long)
  case class LogState(entries: List[Ev])

  /** Incremental top-N by offset: insert keeping the list sorted
    * descending, truncated at capacity. N is small (retention bound),
    * so insertion is O(capacity) worst-case per event. Redelivery of
    * an already-retained offset is a no-op (offsets are unique in the
    * log, as in memlog) — a duplicate must not evict a distinct entry. */
  private[graft] def insert(entries: List[Ev], e: Ev, capacity: Int): List[Ev] = {
    val (hi, lo) = entries.span(_.offset > e.offset)
    if (lo.headOption.exists(_.offset == e.offset)) entries
    else {
      val merged = hi ::: e :: lo
      if (merged.length > capacity) merged.take(capacity) else merged
    }
  }

  /** Bounded log over a (possibly streaming) Dataset[Ev]; emits the
    * full retained set for each updated route every micro-batch. */
  def boundedLog(events: Dataset[Ev], capacity: Int): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.route)
      .flatMapGroupsWithState[LogState, Ev](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (route: String, it: Iterator[Ev], state: GroupState[LogState]) =>
          val prev = state.getOption.map(_.entries).getOrElse(Nil)
          val next = it.foldLeft(prev)((acc, e) => insert(acc, e, capacity))
          state.update(LogState(next))
          next.iterator
      }
  }

  /** The reference's `since` lookup over the retained log: smallest
    * offset at-or-after the timestamp, else largest earlier
    * (timestamp2offset.go:60-80). */
  def nearestOffset(retained: Dataset[Ev], sinceUs: Long): Dataset[(String, Long)] = {
    import retained.sparkSession.implicits._
    retained.toDF()
      .groupBy("route")
      .agg(
        min(when(col("us") >= sinceUs, col("offset"))).as("fwd"),
        max(when(col("us") < sinceUs, col("offset"))).as("bwd"))
      .select(col("route"), coalesce(col("fwd"), col("bwd")).as("offset"))
      .as[(String, Long)]
  }

  /** Streaming entry: bounded log over the events file stream. */
  def streamBoundedLog(spark: SparkSession, dir: String, capacity: Int): Dataset[Ev] = {
    import spark.implicits._
    val evs = EventStreams.readEvents(spark, dir)
      .select(col("event_type").as("route"), col("event_id").as("offset"),
        expr("ts DIV 1000").as("us"))
      .as[Ev]
    boundedLog(evs, capacity)
  }
}
