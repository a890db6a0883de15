package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopK
import graft.functions.TopK.Scored
import graft.streaming.RetentionState
import graft.streaming.RetentionState.Ev

/** Randomized-property tests (seeded, 200 trials) for the
  * order-sensitivity-critical pieces: partial aggregation is only
  * correct if reduce/merge results are invariant to how Spark splits
  * and orders the input.
  */
class PropertySpec extends AnyFunSuite {

  private def rankKey(s: Scored) =
    (-BigDecimal(s.sim).setScale(9, BigDecimal.RoundingMode.HALF_UP), s.id)

  test("TopKAgg: any split/order of the input yields the exact top-k") {
    val agg = new TopK.TopKAgg(5)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val xs = List.tabulate(rnd.nextInt(40))(i =>
        Scored(i.toLong, rnd.nextDouble() * 2 - 1))
      val expected = xs.sortBy(rankKey).take(5)
      // random split into chunks, each reduced independently in
      // shuffled order, merged in random chunk order — mimics partial
      // aggregation across partitions
      val chunks = rnd.shuffle(xs).groupBy(_ => rnd.nextInt(4)).values.toList
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == expected)
    }
  }

  test("TopKAgg: buffer never exceeds k") {
    val agg = new TopK.TopKAgg(3)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val xs = List.tabulate(rnd.nextInt(50))(i => Scored(i.toLong, rnd.nextDouble()))
      assert(xs.foldLeft(agg.zero)(agg.reduce).length <= 3)
    }
  }

  test("RetentionState.insert: keeps exactly the newest-N distinct offsets") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val cap = 1 + rnd.nextInt(10)
      // duplicates included: redelivery must not evict distinct entries
      val offs = List.fill(rnd.nextInt(40))(rnd.nextInt(20).toLong)
      val evs = offs.map(o => Ev("r", o, o * 10))
      val log = evs.foldLeft(List.empty[Ev])((acc, e) =>
        RetentionState.insert(acc, e, cap))
      val expected = offs.distinct.sorted(Ordering[Long].reverse).take(cap)
      assert(log.map(_.offset) == expected)
    }
  }
}
