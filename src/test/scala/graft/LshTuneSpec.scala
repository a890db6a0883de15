package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, LshTune}

/** W3: the LSH band-parameter tuner, gated against an INDEPENDENT
  * recomputation (plain Scala over the collected W2 decile counts)
  * plus the published-curve invariants the inversion rests on. */
class LshTuneSpec extends SparkSpec {

  import spark.implicits._

  test("analytic collision curve invariants (LRU ch. 3)") {
    // monotone in s for fixed (b, r); degenerate families collapse to
    // the published closed forms: b=1 -> s^r, r=1 -> 1-(1-s)^b
    for ((b, r) <- LshTune.candidates) {
      val ps = (0 to 9).map(d => LshTune.pCollide(LshTune.midpoint(d), b, r))
      assert(ps.zip(ps.tail).forall { case (a, c) => a <= c },
        s"p not monotone for (b=$b, r=$r): $ps")
      assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    }
    val s = 0.35
    var sr = 1.0
    (1 to 3).foreach(_ => sr *= s)
    // b=1: AND-only — 1-(1-s^r), the function's own arithmetic (the
    // mathematical identity 1-(1-x) = x does NOT hold bitwise)
    assert(LshTune.pCollide(s, 1, 3) == 1.0 - (1.0 - sr))
    assert(math.abs(LshTune.pCollide(s, 1, 1) - s) < 1e-15)
  }

  test("tuner matches an independent recomputation over the same W2 table") {
    // planted W2 table: pair mass concentrated at the extremes (the
    // real corpus shape — most pairs unrelated, a small dup family)
    val w2 = Seq(
      (0, 20000L, 1L), (1, 8000L, 2L), (2, 3000L, 5L), (3, 900L, 9L),
      (4, 300L, 30L), (5, 120L, 70L), (6, 80L, 60L), (7, 50L, 45L),
      (8, 30L, 29L), (9, 25L, 25L))
      .toDF("jac_decile", "n_pairs", "n_collide")
      .withColumn("p_collide",
        round(col("n_collide").cast("double") / col("n_pairs"), 6))
    val out = LshTune.lshTuneFrom(spark, w2).collect()
    assert(out.length == LshTune.candidates.size)

    // independent recomputation, same analytic curve, plain Scala
    val n = Map(0 -> 20000L, 1 -> 8000L, 2 -> 3000L, 3 -> 900L,
      4 -> 300L, 5 -> 120L, 6 -> 80L, 7 -> 50L, 8 -> 30L, 9 -> 25L)
    def recall(b: Int, r: Int): Double = {
      val num = (5 to 9).map(d =>
        LshTune.pCollide(LshTune.midpoint(d), b, r) * n(d)).sum
      num / (5 to 9).map(n).sum
    }
    def fpLoad(b: Int, r: Int): Double =
      (0 to 4).map(d => LshTune.pCollide(LshTune.midpoint(d), b, r) * n(d)).sum
    // Spark's round(double, 6) is BigDecimal(double).setScale(HALF_UP)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = LshTune.candidates.map { case (b, r) =>
      (b, r, r6(recall(b, r)), r6(fpLoad(b, r)))
    }
    val eligible = expect.filter(_._3 >= LshTune.RecallTarget)
    assert(eligible.nonEmpty, "fixture must admit at least one family")
    val expectChosen = eligible.minBy(t => (t._4, t._1, t._2))
    out.foreach { row =>
      val (b, r) = (row.getInt(0), row.getInt(1))
      val e = expect.find(t => t._1 == b && t._2 == r).get
      assert(math.abs(row.getDouble(3) - e._3) < 1e-9,
        s"recall mismatch at (b=$b, r=$r): ${row.getDouble(3)} vs ${e._3}")
      assert(math.abs(row.getDouble(4) - e._4) < 1e-9,
        s"fp load mismatch at (b=$b, r=$r)")
      assert(row.getBoolean(5) == (e._3 >= LshTune.RecallTarget))
      assert(row.getBoolean(6) ==
        (b == expectChosen._1 && r == expectChosen._2),
        s"chosen mismatch at (b=$b, r=$r)")
    }
  }

  test("tuned family check: identical docs always collide, disjoint never, predictions are the analytic curve") {
    // s = 1 -> P(collide) = 1 for ANY (b, r): an identical pair MUST
    // collide under every family the tuner can choose; docs sharing no
    // shingle can never share a band key (min-hashes of disjoint sets
    // under an md5 family are equal only by hash collision)
    val docs = Seq(
      (1L, "the same exact duplicated text body here"),
      (2L, "the same exact duplicated text body here"),
      (3L, (1 to 30).map(i => s"left$i").mkString(" ")),
      (4L, (1 to 30).map(i => s"right$i").mkString(" ")))
      .toDF("doc_id", "text")
    for ((b, r) <- Seq((2, 6), (4, 3), (1, 12))) {
      val out = LshTune.lshTunedCheckFrom(spark, docs, b, r)
        .collect().map(row => row.getInt(0) ->
          (row.getLong(3), row.getLong(4), row.getDouble(6))).toMap
      // decile 9 holds exactly the identical pair: measured 1/1
      assert(out(9) == ((1L, 1L,
        BigDecimal(LshTune.pCollide(0.95, b, r))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)),
        s"decile 9 wrong for (b=$b, r=$r): ${out(9)}")
      // decile 0 holds the 5 disjoint pairs: zero collisions
      assert(out(0)._1 == 5L && out(0)._2 == 0L,
        s"decile 0 wrong for (b=$b, r=$r): ${out(0)}")
    }
  }

  test("the corpus pick is deterministic and feeds the check") {
    val p1 = LshTune.pick(spark, sfDir)
    val p2 = LshTune.pick(spark, sfDir)
    assert(p1 == p2)
    assert(p1._1 * p1._2 <= Dedup.H)
    val out = LshTune.lshTunedCheck(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(row =>
      row.getInt(1) == p1._1 && row.getInt(2) == p1._2))
  }

  test("exactly one chosen family on the corpus, and it is eligible within the H budget") {
    val out = LshTune.lshTune(spark, sfDir).collect()
    val chosen = out.filter(_.getBoolean(6))
    assert(chosen.length == 1, s"expected one chosen family, got ${chosen.length}")
    val c = chosen.head
    assert(c.getBoolean(5), "chosen family must be eligible")
    assert(c.getInt(0) * c.getInt(1) <= Dedup.H,
      "chosen family exceeds the signature budget")
  }

  test("W5 reband: full-pipeline pair sets honor the family semantics (degenerate + planted cases)") {
    // A (12, 1) OR-only family collides ANY pair sharing one min-hash;
    // a (1, 12) AND-only family collides only full-signature matches.
    // Identical docs collide under BOTH; distinct docs with partial
    // overlap collide under the OR family far more readily — the
    // pair-set diff must reflect the containment.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), // identical pair: collides in any family
      (3L, (1 to 40).map(i => s"tok$i").mkString(" ") + " extra1 extra2"),
      (4L, (20 to 60).map(i => s"tok$i").mkString(" ")),
      (5L, (100 to 140).map(i => s"zzz$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = LshTune.lshRebandFrom(spark, docs, 1, 12).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("fixed", "tuned"))
    val fixed = out(0); val tuned = out(1)
    // arithmetic invariant: candidates split exactly into verified + fp
    for (r <- out)
      assert(r.getAs[Long]("n_candidates") ==
        r.getAs[Long]("n_verified") + r.getAs[Long]("n_fp"))
    // the AND-only (1,12) family's candidate set is a subset of any
    // family that includes per-band sub-signatures of the full one: a
    // full 12-hash match implies every 3-hash band matches
    assert(tuned.getAs[Long]("n_verified") <= fixed.getAs[Long]("n_verified"))
    assert(tuned.getAs[Long]("n_only_here") == 0L,
      "a (1,12) verified pair is verified under (4,3) too")
    // the identical pair is caught by both
    assert(tuned.getAs[Long]("n_verified") >= 1L)
    // EMPTY candidate set: two fully-disjoint docs produce zero
    // candidates in every family — the counting aggregates must emit
    // 0 (the DuckDB twin's count(*) shape), never SQL NULL
    val disjoint = Seq(
      (1L, (1 to 40).map(i => s"aaa$i").mkString(" ")),
      (2L, (1 to 40).map(i => s"bbb$i").mkString(" ")))
      .toDF("doc_id", "text")
    for (r <- LshTune.lshRebandFrom(spark, disjoint, 1, 12).collect()) {
      assert(!r.isNullAt(r.fieldIndex("n_verified")) &&
        r.getAs[Long]("n_verified") == 0L, s"null/nonzero n_verified: $r")
      assert(!r.isNullAt(r.fieldIndex("n_fp")) &&
        r.getAs[Long]("n_fp") == 0L, s"null/nonzero n_fp: $r")
    }
    // the corpus-level gated form runs with the tuner's own pick
    val corpus = LshTune.lshReband(spark, sfDir).collect()
    val pk = LshTune.pick(spark, sfDir)
    assert(corpus.length == 2)
    assert(corpus(1).getInt(1) == pk._1 && corpus(1).getInt(2) == pk._2)
  }
}
