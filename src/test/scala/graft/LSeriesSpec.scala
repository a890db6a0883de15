package graft

import org.apache.spark.sql.functions._

import graft.operators.{Boilerplate, CorpusStats, Dedup, Selection, SnapshotDiff}
import graft.sources.Tables

/** L-series: survivor selection (L1/L3), boilerplate span scrubbing
  * (L2), delta-driven verdict maintenance (L4). */
class LSeriesSpec extends SparkSpec {

  // ------------------------------------------------------------- L1
  test("quality top-frac keeps ceil(30%) per source, the best-scored docs") {
    val got = Selection.qualityTopFrac(spark, sfDir)
    val perSrc = got.groupBy("source")
      .agg(count(lit(1)).as("kept"), max("n_src").as("n"))
      .collect()
    assert(perSrc.nonEmpty)
    perSrc.foreach { r =>
      val (kept, n) = (r.getLong(1), r.getLong(2))
      assert(kept == (3 * n + 9) / 10,
        s"${r.getString(0)}: kept $kept of $n != ceil(30%)")
    }
    // kept min score >= dropped max score within every source
    val q = graft.operators.TextAnalysis.quality(spark, sfDir)
      .select("doc_id", "quality_score")
    val all = Tables.documents(spark, sfDir).select("doc_id", "source").join(q, "doc_id")
    val keptIds = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val bySrc = all.collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
      .groupBy(_._1)
    bySrc.foreach { case (src, rows) =>
      val kept = rows.filter(r => keptIds(r._2)).map(_._3)
      val dropped = rows.filterNot(r => keptIds(r._2)).map(_._3)
      if (kept.nonEmpty && dropped.nonEmpty)
        assert(kept.min >= dropped.max,
          s"$src: kept a worse doc (${kept.min}) than a dropped one (${dropped.max})")
    }
  }

  test("approx threshold gate agrees with exact up to the sketch band, no sort in its plan") {
    val exact = Selection.qualityTopFrac(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = Selection.qualityThresholdApprox(spark, sfDir)
    val approxIds = approx.select("doc_id").collect().map(_.getLong(0)).toSet
    val sym = (exact diff approxIds) ++ (approxIds diff exact)
    // the sketch can only misplace docs in a thin rank band around the
    // cut; on the fixture that is a small fraction of the corpus
    val n = Tables.documents(spark, sfDir).count()
    assert(sym.size <= n / 20,
      s"approx gate diverged on ${sym.size} of $n docs (>5%)")
    // plan contract: the production path never sorts the corpus — no
    // window/rank operator anywhere (the agg + broadcast join is all)
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window "),
      s"approx gate plan contains a window:\n$plan")
  }

  // ------------------------------------------------------------- L3
  test("cluster representatives: one per cluster, the max-quality member") {
    val reps = Selection.clusterRepresentatives(spark, sfDir).collect()
    assert(reps.nonEmpty, "fixture has planted near-dup clusters")
    val clusters = Dedup.dupClusters(spark, sfDir)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val quality = graft.operators.TextAnalysis.quality(spark, sfDir)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byCluster = clusters.groupBy(_._2)
    assert(reps.length == byCluster.size, "exactly one rep per cluster")
    reps.foreach { r =>
      val (cid, rep, repQ, nMembers) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      val members = byCluster(cid).map(_._1)
      assert(members.length.toLong == nMembers)
      assert(members.contains(rep))
      val best = members.map(quality).max
      assert(repQ == best, s"cluster $cid rep quality $repQ != best $best")
      // deterministic tie-break: smallest id among the best-scored
      assert(rep == members.filter(m => quality(m) == best).min)
    }
  }

  test("cluster representative rank plans as a constant-limit WindowGroupLimit") {
    val plan = Selection.clusterRepresentatives(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank=1 quota did not rewrite to WindowGroupLimit:\n$plan")
  }

  // ------------------------------------------------------------- L2
  test("boilerplate scrub: hot tiles gone, cold text intact, counts consistent") {
    val out = Boilerplate.scrub(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count()
    assert(out.length.toLong == n, "every doc survives as a row")
    val dropped = out.map(_.getLong(3)).sum
    assert(dropped > 0, "fixture corpus has hot tiles at the floor threshold")
    out.foreach { r =>
      val (clean, nTiles, nDropped) = (r.getString(1), r.getLong(2), r.getLong(3))
      assert(nDropped >= 0 && nDropped <= nTiles)
      // reassembled text has exactly the surviving tiles' tokens
      if (nDropped == 0)
        assert(clean.nonEmpty)
    }
    // guard: the broadcast hot set is small on this corpus
    val hot = Boilerplate.hotSetSize(spark, sfDir)
    assert(hot > 0 && hot < 10000, s"hot set size $hot out of expected band")
  }

  test("scrub's second pass is narrow: hot set broadcasts, docs never sort-merge") {
    val plan = Boilerplate.scrub(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only join is the 1-row hot-array broadcast; a SortMergeJoin
    // would mean the reassembly re-shuffled the corpus
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"hot set not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"scrub re-shuffled the corpus:\n$plan")
  }

  test("scrub round-trips exactly when the hot set is empty (tiny fixture)") {
    import spark.implicits._
    // 3 docs, no tile reaches df>=3 → nothing removed, text identical
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "h i j k l m"),
      (3L, "n o p q r s t u")).toDF("doc_id", "text")
    val out = Boilerplate.scrubFrom(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    docs.collect().foreach { r =>
      val (clean, nd) = out(r.getLong(0))
      assert(nd == 0 && clean == r.getString(1),
        s"doc ${r.getLong(0)} changed without boilerplate: '$clean'")
    }
  }

  test("scrub removes a planted boilerplate span from every carrier") {
    import spark.implicits._
    val footer = "x y z" // one exact tile, planted in 4 of 6 docs
    val docs = Seq(
      (1L, s"a b c $footer"), (2L, s"d e f $footer"),
      (3L, s"g h i $footer"), (4L, s"j k l $footer"),
      (5L, "m n o p q r"), (6L, "s t u v w")).toDF("doc_id", "text")
    val out = Boilerplate.scrubFrom(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      val (clean, nd) = out(id)
      assert(nd == 1 && !clean.contains("x y z"), s"doc $id: '$clean'")
    }
    Seq(5L, 6L).foreach { id => assert(out(id)._2 == 0L) }
  }

  test("scrub fails loudly when the hot set exceeds the broadcast cap") {
    import spark.implicits._
    val footer = "x y z" // one hot tile → hot set size 1 > cap 0
    val docs = Seq(
      (1L, s"a b c $footer"), (2L, s"d e f $footer"),
      (3L, s"g h i $footer"), (4L, s"j k l $footer")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Boilerplate.scrubFrom(docs, cap = 0L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exceeds broadcast cap")),
      s"wrong failure: $e")
    // and the same corpus passes untouched under the shipped cap
    assert(Boilerplate.scrubFrom(docs).collect().length == 4)
  }

  // ------------------------------------------------------------- L4
  test("delta maintenance equals full rebuild WITHOUT reading untouched text") {
    val (oldDocs, newDocs) = SnapshotDiff.synthOldNew(spark, sfDir)
    val oldVerdicts = Dedup.exactFrom(oldDocs)
      .select("doc_id", "sig", "canonical_id", "group_size", "is_dup")
    val delta = SnapshotDiff.diff(oldDocs, newDocs)
    // poison every NON-delta doc's text: any path that hashes it
    // produces a sig that cannot match the intact rebuild
    val deltaIds = delta.select(col("doc_id"))
    val poisoned = newDocs.join(deltaIds, Seq("doc_id"), "left_anti")
      .withColumn("text", lit("POISONED"))
      .unionByName(newDocs.join(deltaIds, Seq("doc_id"), "left_semi"))
    val got = SnapshotDiff.maintainExactDedup(oldVerdicts, poisoned, delta)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    val want = Dedup.exactFrom(newDocs)
      .select("doc_id", "sig", "canonical_id", "group_size", "is_dup")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(got == want,
      s"maintenance diverged: only-got=${(got diff want).take(3)} " +
        s"only-want=${(want diff got).take(3)}")
  }

  // --------------------------------------- K5/K6 maintenance (r10)
  test("delta-maintained token counts power bit-equal tf-idf WITHOUT reading untouched text") {
    val (oldDocs, newDocs) = SnapshotDiff.synthOldNew(spark, sfDir)
    val delta = SnapshotDiff.diff(oldDocs, newDocs)
    val oldCounts = CorpusStats.tokenCounts(oldDocs)
    val deltaIds = delta.select(col("doc_id"))
    val poisoned = newDocs.join(deltaIds, Seq("doc_id"), "left_anti")
      .withColumn("text", lit("POISONED"))
      .unionByName(newDocs.join(deltaIds, Seq("doc_id"), "left_semi"))
    val maintained = CorpusStats.maintainTokenCounts(oldCounts, poisoned, delta)
    val got = CorpusStats.tfidfFromCounts(maintained).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val want = CorpusStats.tfidfFromCounts(CorpusStats.tokenCounts(newDocs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got == want,
      s"tf-idf maintenance diverged: only-got=${(got diff want).take(3)} " +
        s"only-want=${(want diff got).take(3)}")
  }

  test("delta-maintained token counts power bit-equal source drift") {
    val (oldDocs, newDocs) = SnapshotDiff.synthOldNew(spark, sfDir)
    val delta = SnapshotDiff.diff(oldDocs, newDocs)
    val poisonedIds = delta.select(col("doc_id"))
    val poisoned = newDocs.join(poisonedIds, Seq("doc_id"), "left_anti")
      .withColumn("text", lit("POISONED"))
      .unionByName(newDocs.join(poisonedIds, Seq("doc_id"), "left_semi"))
    val maintained = CorpusStats.maintainTokenCounts(
      CorpusStats.tokenCounts(oldDocs), poisoned, delta)
    val got = CorpusStats.sourceDriftFromCounts(maintained).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2), r.getDouble(3)))
    val want = CorpusStats.sourceDriftFromCounts(
      CorpusStats.tokenCounts(newDocs)).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2), r.getDouble(3)))
    assertDriftEqual(got, want, "drift maintenance diverged")
  }

  /** TV is an order-dependent float sum — partition order legitimately
    * shifts the last ulp, so drift rows compare strings exactly and
    * doubles to 1e-9 (the operators' own display rounding). */
  private def assertDriftEqual(got: Array[(String, Double, String, Double)],
                               want: Array[(String, Double, String, Double)],
                               what: String): Unit = {
    assert(got.length == want.length, s"$what: row counts differ")
    got.zip(want).foreach { case ((s1, tv1, t1, g1), (s2, tv2, t2, g2)) =>
      assert(s1 == s2 && t1 == t2, s"$what: ($s1,$t1) vs ($s2,$t2)")
      assert(math.abs(tv1 - tv2) <= 1e-9 && math.abs(g1 - g2) <= 1e-9,
        s"$what: $s1 tv $tv1 vs $tv2, gap $g1 vs $g2")
    }
  }

  test("FromCounts paths equal the live K5/K6 forms on the same docs") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val counts = CorpusStats.tokenCounts(docs)
    val tfidfLive = CorpusStats.tfidfTopTerms(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val tfidfCounts = CorpusStats.tfidfFromCounts(counts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(tfidfCounts == tfidfLive, "K5 FromCounts != live form")
    val driftLive = CorpusStats.sourceDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2), r.getDouble(3)))
    val driftCounts = CorpusStats.sourceDriftFromCounts(counts).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2), r.getDouble(3)))
    assertDriftEqual(driftCounts, driftLive, "K6 FromCounts != live form")
  }

  test("delta maintenance hands the crown over when a canonical is removed") {
    import spark.implicits._
    // docs 1,2,3 identical; old canonical is 1; new snapshot removes 1
    val oldDocs = Seq((1L, "same text"), (2L, "same text"),
      (3L, "same text"), (4L, "other")).toDF("doc_id", "text")
    val newDocs = Seq((2L, "same text"), (3L, "same text"),
      (4L, "other")).toDF("doc_id", "text")
    val got = SnapshotDiff.maintainExactDedup(
      Dedup.exactFrom(oldDocs), newDocs, SnapshotDiff.diff(oldDocs, newDocs))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(got(2L) == (2L, false), "doc 2 takes the crown")
    assert(got(3L) == (2L, true))
    assert(got(4L) == (4L, false), "untouched group carried")
  }
}
