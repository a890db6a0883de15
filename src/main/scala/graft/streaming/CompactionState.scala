package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** K3: streaming log compaction — J4's latest-wins current state kept
  * LIVE over the event stream: per key, state is exactly one record
  * (the lexicographic (ts, event_id) max seen so far), updated per
  * micro-batch and re-emitted only when it changes. The streaming
  * complement of `Compaction.compactLatest` the way A10 complements
  * A4 — a materialized-view read of "current value per user" that a
  * serving layer can tail instead of recomputing the batch query.
  *
  * State is O(keys): one fixed-width record per user ever, no event
  * history retained — the compacted-topic contract. Late/out-of-order
  * events are handled by the same total order as the batch operator
  * ((ts, event_id) lexicographic), so replay order cannot change the
  * final state: an older event arriving after a newer one loses the
  * comparison and emits nothing.
  */
object CompactionState {

  case class Rec(user_id: Long, event_id: Long, us: Long,
                 event_type: String, value: Double)

  private[graft] def newer(a: Rec, b: Rec): Boolean =
    a.us > b.us || (a.us == b.us && a.event_id > b.event_id)

  /** Latest-wins state over a (possibly streaming) Dataset[Rec]; emits
    * the new winner for each key whose state CHANGED this batch. */
  def compacted(events: Dataset[Rec]): Dataset[Rec] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Rec, Rec](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Rec], state: GroupState[Rec]) =>
          val batchBest = it.reduceOption((a, b) => if (newer(a, b)) a else b)
          batchBest match {
            case Some(c) if state.getOption.forall(prev => newer(c, prev)) =>
              state.update(c)
              Iterator.single(c)
            case _ => Iterator.empty
          }
      }
  }

  /** Streaming entry over the events file stream, with J4's validity
    * rules (rows without key or timestamp never become state). */
  def streamCompacted(spark: SparkSession, dir: String): Dataset[Rec] = {
    import spark.implicits._
    val evs = EventStreams.readEvents(spark, dir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("us"),
        col("event_type"), col("value"))
      .as[Rec]
    compacted(evs)
  }
}
