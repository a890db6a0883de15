package graft.streaming

import java.util.concurrent.ConcurrentSkipListMap
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Shared-query serving core: ONE continuous Spark query per event
  * directory feeds an in-JVM bounded ring log, and every connected
  * client replays from its own seek position out of the ring and then
  * rides the live feed — the reference's actual architecture (one KCL
  * ingest into a capacity-bounded memlog, service.go:100-106, with an
  * independent `ml.Stream(ctx, off)` seek per connected handler,
  * service.go:244-262).
  *
  * This is the scale path for many concurrent clients: N subscribers
  * cost ONE streaming query + N bounded queues, where
  * [[SseSink.serveLive]]/[[SseHttpServer]] run one query per client
  * (simpler, with per-client predicate pushdown — the right trade for
  * few clients). Like the reference's memlog, the ring is bounded: a
  * client seeking before the oldest retained offset replays only what
  * capacity kept (memlog.WithMaxSegmentSize semantics).
  *
  * Ordering: within a source partition frames arrive in offset order;
  * across partitions interleaving can occur, exactly as the
  * reference's per-shard consumers interleave into one log. The ring
  * itself is offset-sorted, so replays are always ordered; only the
  * live tail can interleave.
  */
class SseHub(spark: SparkSession, dir: String,
             capacity: Int = 100000,
             pollIntervalMs: Long = 100L,
             maxQueuedFrames: Int = 10000) {

  import SseHub._

  private val hubId = hubIds.incrementAndGet()
  private val ring = new ConcurrentSkipListMap[Long, Entry]()
  private val subs = TrieMap.empty[Long, Sub]
  private var query: Option[StreamingQuery] = None

  /** Start the single shared ingest query (idempotent). */
  def start(): StreamingQuery = synchronized {
    query.getOrElse {
      hubs.put(hubId, this)
      val q = EventStreams.readEvents(spark, dir)
        .select(col("event_id"), col("event_type"),
          SseSink.frameCol.as("frame"))
        .writeStream
        .foreach(new HubWriter(hubId))
        .trigger(Trigger.ProcessingTime(pollIntervalMs))
        .start()
      query = Some(q)
      q
    }
  }

  def stop(): Unit = synchronized {
    query.foreach(q => try q.stop() catch { case _: Exception => () })
    query = None
    hubs.remove(hubId)
    subs.clear()
  }

  def activeSubscribers: Int = subs.size
  def retainedRange: Option[(Long, Long)] =
    if (ring.isEmpty) None else Some((ring.firstKey(), ring.lastKey()))

  /** Subscribe a client at its own seek position: frames with offset
    * strictly after `afterOffset` on `route`. Retained history is
    * replayed into the returned queue immediately (offset order);
    * later arrivals follow live. The subscription and replay are
    * atomic with respect to appends, so no frame is lost or doubled
    * at the hand-over point. */
  def subscribe(route: String, afterOffset: Long = Long.MinValue): Subscription =
    lock.synchronized {
      val id = subIds.incrementAndGet()
      val queue = new BoundedQueue(maxQueuedFrames)
      val sub = Sub(route, afterOffset, queue)
      // replay BEFORE registering would drop frames appended between;
      // registering before replay would double them. Under the append
      // lock, replay-then-register is exact.
      val it = ring.tailMap(afterOffset, false).values.iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.route == route) queue.add(e.frame)
      }
      subs.put(id, sub)
      Subscription(id, this, queue)
    }

  private[streaming] def unsubscribe(id: Long): Unit = subs.remove(id)

  private[streaming] def append(offset: Long, route: String, frame: String): Unit =
    lock.synchronized {
      ring.put(offset, Entry(offset, route, frame))
      while (ring.size() > capacity) ring.pollFirstEntry() // memlog-style eviction
      subs.values.foreach { s =>
        if (s.route == route && offset > s.afterOffset) s.queue.add(frame)
      }
    }

  // One lock serializes append/subscribe for exact replay hand-over.
  // Appends arrive per micro-batch (not per network packet), so the
  // critical section is cold; a production hub would shard it by route.
  private val lock = new Object
}

object SseHub {
  private[streaming] case class Entry(offset: Long, route: String, frame: String)
  private case class Sub(route: String, afterOffset: Long, queue: BoundedQueue)

  /** Handle a client holds: its frame queue + unsubscribe. */
  final case class Subscription(id: Long, private val hub: SseHub,
                                queue: BoundedQueue) {
    def close(): Unit = hub.unsubscribe(id)
  }

  /** Bounded frame buffer: overflow marks the subscriber dead rather
    * than growing the heap (the serving layer turns that into a
    * disconnect, as [[SseHttpServer]] does). */
  final class BoundedQueue(cap: Int) {
    private val q = new java.util.concurrent.LinkedBlockingQueue[String](cap)
    @volatile var overflowed = false
    def add(frame: String): Unit = if (!q.offer(frame)) overflowed = true
    def poll(): String = q.poll()
    def size: Int = q.size()
    def drain(): Seq[String] = {
      val out = Vector.newBuilder[String]
      var f = q.poll()
      while (f != null) { out += f; f = q.poll() }
      out.result()
    }
  }

  // Static registries: the ForeachWriter serializes per task, so it
  // carries only the hub id and resolves the JVM-side hub instance
  // (see SseSink.InMemoryTransport for the pattern rationale).
  private val hubIds = new AtomicLong(0L)
  private val subIds = new AtomicLong(0L)
  private val hubs = TrieMap.empty[Long, SseHub]

  private final class HubWriter(hubId: Long) extends ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(r: Row): Unit =
      hubs.get(hubId).foreach(_.append(r.getLong(0), r.getString(1), r.getString(2)))
    override def close(errorOrNull: Throwable): Unit = ()
  }
}
