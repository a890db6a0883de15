package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K7: Misra–Gries heavy hitters as a typed Aggregator — the
  * constant-memory frequent-items sketch for streams/corpora whose
  * exact token histogram is itself too big to shuffle: the buffer
  * holds at most k counters at EVERY stage (map-side partial,
  * shuffle, merge), so each partition contributes k rows to the
  * exchange regardless of vocabulary size — the TopK shape applied
  * to frequency estimation.
  *
  * Guarantees (the published MG bounds, which HeavyHittersSpec
  * gates): for input of n items, every item with true count
  * > n/(k+1) is present in the sketch, and each reported estimate
  * undercounts its true frequency by at most n/(k+1). Merging two
  * sketches (Agarwal et al.'s mergeable-summaries result) preserves
  * the combined bound — which is what makes the map-side partial
  * sound: merge = add matching counters, then decrement all by the
  * (k+1)-th largest and drop non-positive.
  *
  * The estimates are deterministic for a fixed partitioning but NOT
  * across partitionings (merge order moves the decrement); the
  * GUARANTEED-survivor set at the gate's threshold is what a caller
  * may rely on, and what the spec asserts against exact counts.
  */
object HeavyHitters {

  class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1)

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
      buf.get(item) match {
        case Some(c) => buf.updated(item, c + 1)
        case None if buf.size < k => buf.updated(item, 1L)
        case None =>
          // decrement-all: drop zeros, the classic MG step
          buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // keep the k largest by subtracting the (k+1)-th largest count
        val cut = sum.values.toSeq.sortBy(-_).apply(k)
        sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column aggregate: the MG sketch of a string column as map<string,
    * long> of surviving counters (≤ k entries). */
  def mgSketchOf(c: Column, k: Int): Column = udaf(new MisraGries(k)).apply(c)
}
