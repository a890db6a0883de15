package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** P3 gates: the UniMax waterfill on a hand-computed skewed mix —
  * small sources cap at E epochs, the leftover spreads uniformly, the
  * budget is conserved exactly, and the copy counts are the
  * deterministic full-copies + hash-ranked-residual split. */
class UnimaxSpec extends SparkSpec {

  test("waterfill allocation matches the hand-computed skewed mix") {
    import spark.implicits._
    // A:100 B:10 C:2 docs; E=4, T=3·112=336.
    // capacities e = [C:8, B:40, A:400] ascending; C: 8·3 ≤ 336 capped,
    // B: 40·2 ≤ 328 capped, A: 400 > 288 uncapped → a_A = 288 (2.88
    // epochs — the cap bound small sources at 4, big ones at budget).
    val docs = ((1 to 100).map(i => (i.toLong, "A")) ++
      (101 to 110).map(i => (i.toLong, "B")) ++
      Seq((111L, "C"), (112L, "C")))
      .toDF("doc_id", "source")
    val got = Sampling.mixUnimaxFrom(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == 112, "every doc gets a weight row")
    val bySrc = got.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).sum }
    assert(bySrc == Map("A" -> 288L, "B" -> 40L, "C" -> 8L),
      s"per-source draw totals diverged: $bySrc")
    assert(got.map(_._3).sum == 336L, "budget not conserved exactly")
    // capped sources: every doc exactly E copies
    assert(got.filter(_._2 == "C").forall(_._3 == 4L))
    assert(got.filter(_._2 == "B").forall(_._3 == 4L))
    // uncapped: 288 over 100 docs = 2 full copies + 88 hash-ranked extras
    val aCopies = got.filter(_._2 == "A").map(_._3)
    assert(aCopies.count(_ == 3L) == 88 && aCopies.count(_ == 2L) == 12,
      s"A split wrong: ${aCopies.groupBy(identity).view.mapValues(_.size).toMap}")
  }

  test("a uniform mix with slack budget allocates the uniform share everywhere") {
    import spark.implicits._
    // 4 equal sources of 10, T = 3·40 = 120, e = 40 each: 40·4 > 120
    // → nobody capped, a = 120 DIV 4 = 30 per source (3 epochs < cap)
    val docs = (0 until 40).map(i => (i.toLong, s"s${i % 4}"))
      .toDF("doc_id", "source")
    val got = Sampling.mixUnimaxFrom(docs).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    val bySrc = got.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).sum }
    assert(bySrc.values.toSet == Set(30L), s"uniform share broken: $bySrc")
  }

  test("materialization rank is two-level: no full-source rank window in the plan") {
    import spark.implicits._
    // the round-11 scale-killer: a row_number window partitioned by
    // source ALONE sorts a dominant crawl source in one task. The
    // two-level form ranks only per (source, bkt); this contract fails
    // on the old single-window shape.
    val docs = (0 until 200).map(i =>
      (i.toLong, if (i < 180) "big" else s"s${i % 4}")).toDF("doc_id", "source")
    val plan = Sampling.mixUnimaxFrom(docs).queryExecution.optimizedPlan
    val wins = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty, "expected window nodes in the unimax plan")
    val offenders = wins.filter { w =>
      w.windowExpressions.exists(_.toString.toLowerCase.contains("row_number")) &&
        w.partitionSpec.flatMap(_.references.map(_.name)).toSet == Set("source")
    }
    assert(offenders.isEmpty,
      s"full-source rank window found: ${offenders.map(_.partitionSpec)}")
    // and the intra-bucket rank really is bucketed
    assert(wins.exists { w =>
      w.windowExpressions.exists(_.toString.toLowerCase.contains("row_number")) &&
        w.partitionSpec.flatMap(_.references.map(_.name)).toSet == Set("source", "bkt")
    }, "expected the (source, bkt)-partitioned straddle rank")
  }
}
