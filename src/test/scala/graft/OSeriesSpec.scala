package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CharLm, Curriculum, Dedup, Retrieval, Sampling, SemanticDedup, SimilaritySearch, TextAnalysis}
import graft.sources.Tables

/** O-series behavior + plan contracts: BM25 retrieval, soft dedup,
  * curriculum ordering, char-LM quality, delta-maintained IVF
  * assignments. */
class OSeriesSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // ------------------------------------------------------------- O1
  test("bm25 ranks the all-terms doc first and never returns a zero-match doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join filter spark join extra words here now"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (3L, "spark filter something else entirely different words pad pad"),
      (4L, "join join join join join join join join join")
    ).toDF("doc_id", "text")
    val rows = Retrieval.bm25TopKFrom(spark, docs).collect()
    val q1 = rows.filter(_.getLong(0) == 1L)
    assert(q1.nonEmpty, "query 1 returned nothing")
    assert(q1.head.getLong(2) == 1L,
      s"doc 1 holds all of q1's terms and must rank first, got doc ${q1.head.getLong(2)}")
    assert(!q1.exists(_.getLong(2) == 2L),
      "doc 2 shares no term with query 1 and must not appear")
    q1.map(_.getDouble(3)).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, "scores must descend with rank")
      case _ =>
    }
  }

  test("bm25 corpus plan: every join is broadcast (matched-terms stay map-side)") {
    val plan = finalPlan(Retrieval.bm25TopK(spark, sfDir))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"bm25 shuffled a join — the query-vocab sides must broadcast:\n$plan")
  }

  // ------------------------------------------------------------- O7
  test("streaming BM25 scorer equals the batch scored frame through a real stream") {
    import org.apache.spark.sql.streaming.Trigger
    val model = Retrieval.bm25Model(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("o7").toFile.getPath
    try {
      Tables.documents(spark, sfDir)
        .write.mode("overwrite").parquet(s"$tmp/docs")
      val name = "o7_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = Retrieval.bm25ScoreStream(
        spark.readStream.schema(Tables.documentsSchema).parquet(s"$tmp/docs"),
        model)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = Retrieval
        .bm25ScoredFrom(spark, Tables.documents(spark, sfDir)).collect()
        .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
      assert(got == want,
        s"stream scores diverged from batch: ${(got diff want).size} extra, " +
          s"${(want diff got).size} missing")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  // ------------------------------------------------------------- O6
  test("rrf fusion: agreement wins, single-list docs still surface, union semantics hold") {
    import spark.implicits._
    // doc 10 is rank 1 in BOTH lists; doc 20 only in A (rank 2);
    // doc 30 only in B (rank 2): RRF must put 10 first, and
    // 20/30 tie on 1/62 — broken by doc_id
    val a = Seq((1L, 1L, 10L), (1L, 2L, 20L)).toDF("query_id", "rank", "doc_id")
    val b = Seq((1L, 1L, 10L), (1L, 2L, 30L)).toDF("query_id", "rank", "doc_id")
    val out = Retrieval.rrfFuse(a, b).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(10L, 20L, 30L),
      s"got ${out.map(_.getLong(2)).mkString(",")}")
    assert(math.abs(out.head.getDouble(3) - 2.0 / 61.0) < 1.01e-6)
    assert(math.abs(out(1).getDouble(3) - 1.0 / 62.0) < 1.01e-6)
  }

  test("single-pass rrf fusion equals the composed two-ranker path, with one corpus scan") {
    val docs = Tables.documents(spark, sfDir)
    val onePass = Retrieval.rrfFusionFrom(spark, docs)
    val composed = Retrieval.rrfFuse(
      Retrieval.bm25TopKFrom(spark, docs),
      Retrieval.tfidfTopKFrom(spark, docs))
    assert(onePass.exceptAll(composed).isEmpty &&
      composed.exceptAll(onePass).isEmpty,
      "single-pass fusion diverged from the composed rankers")
    // the round-10 finding: the fused plan must tokenize the corpus
    // ONCE — one documents scan, where the composed path pays two
    def scans(p: String): Int =
      "Scan parquet".r.findAllIn(p).length + "Scan ExistingRDD".r.findAllIn(p).length
    val plan = finalPlan(onePass)
    val composedPlan = finalPlan(composed)
    assert(scans(plan) < scans(composedPlan),
      s"single-pass plan reads the corpus as often as the composed one:\n$plan")
  }

  // ------------------------------------------------------------- O2
  test("soft dedup: reps are C1's canonicals, copies sum to corpus, weights are sqrt(c)") {
    val docs = Tables.documents(spark, sfDir)
    val soft = Dedup.softDedupFrom(docs).collect()
    assert(soft.map(_.getLong(1)).sum == docs.count(),
      "cluster sizes must partition the corpus")
    val canonicals = Dedup.exactFrom(docs)
      .select("canonical_id").distinct().collect().map(_.getLong(0)).toSet
    assert(soft.map(_.getLong(0)).toSet == canonicals,
      "soft-dedup reps must be exactly C1's canonical ids")
    soft.foreach { r =>
      val expected = math.sqrt(r.getLong(1).toDouble)
      assert(math.abs(r.getDouble(2) - expected) < 1.01e-6,
        s"weight ${r.getDouble(2)} != c^0.5 of ${r.getLong(1)}")
    }
  }

  // ------------------------------------------------------------- P5
  test("soft-weighted sample draws only O2 reps, ≤k per source, favoring heavy clusters") {
    val got = Sampling.softWeightedSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.nonEmpty)
    val reps = Dedup.softDedupFrom(Tables.documents(spark, sfDir))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got.foreach { case (id, _, _, w, _) =>
      assert(reps.contains(id), s"sampled $id is not a soft-dedup rep")
      assert(reps(id) == w, s"weight mismatch for $id")
    }
    got.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.length <= 20, s"$src drew ${rs.length} > k")
      assert(rs.map(_._5).sorted.sameElements(1L to rs.length),
        s"$src ranks not dense")
    }
    // A-ES bias sanity: among sampled rows, mean weight must be >=
    // the corpus mean rep weight (heavier clusters are favored) —
    // on a corpus with any dup structure at all
    val meanAll = reps.values.sum / reps.size
    val meanSampled = got.map(_._4).sum / got.length
    assert(meanSampled >= meanAll - 1e-9,
      f"sampled mean weight $meanSampled%.4f below corpus mean $meanAll%.4f")
  }

  // ------------------------------------------------------------- O3
  test("curriculum order is one narrow projection: no join, window, or aggregate") {
    val plan = finalPlan(
      Curriculum.curriculumOrderFrom(Tables.documents(spark, sfDir)))
    assert(!plan.contains("Join") && !plan.contains("Window") &&
      !plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"curriculum assignment must be shuffle-free per-row work:\n$plan")
  }

  test("curriculum phases follow the E2 score thresholds; pos is an exact hash fraction") {
    val docs = Tables.documents(spark, sfDir)
    val joined = Curriculum.curriculumOrderFrom(docs)
      .join(docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q")), Seq("doc_id"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (phase, pos, q) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      val want = if (q >= Curriculum.Hi) 0L else if (q >= Curriculum.Mid) 1L else 2L
      assert(phase == want, s"doc ${r.getLong(0)}: phase $phase, score $q")
      assert(pos > 0.0 && pos < 1.0)
      // pos = (b + 0.5)/65536 for integer b — exact in binary
      val b = pos * 65536.0 - 0.5
      assert(b == math.rint(b), s"pos $pos is not an exact half-step fraction")
    }
  }

  test("curriculum interleave: in every phase, each source spreads across the pos range") {
    // deterministic on the fixed corpus + fixed salt: hash-uniform pos
    // means each source's docs land ~uniformly, so no source can sit
    // in one end of a phase — the sorted-by-source training-order bug
    val rows = Curriculum.curriculumOrder(spark, sfDir)
      .select("source", "phase", "pos").collect()
    rows.groupBy(r => (r.getString(0), r.getLong(1)))
      .filter(_._2.length >= 10).foreach { case ((src, phase), rs) =>
        val ps = rs.map(_.getDouble(2))
        val firstHalf = ps.count(_ < 0.5).toDouble / ps.length
        assert(firstHalf > 0.2 && firstHalf < 0.8,
          s"source $src phase $phase: ${ps.length} docs, " +
            f"$firstHalf%.2f in the first half — not interleaved")
      }
  }

  // ------------------------------------------------------------- O4
  test("char-LM prices planted gibberish below every clean doc and drops sub-trigram rows") {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val planted = Seq(
      (900001L, "qzxjv wkqpz xvjqz kwpxq zjvkw qpzxk vjqwz"),
      (900002L, "ab")).toDF("doc_id", "text")
    val out = CharLm.lmScoreFrom(base.unionByName(planted)).collect()
    val byId = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!byId.contains(900002L), "a 2-char doc has no trigram and must drop out")
    val gib = byId(900001L)
    val cleanMin = byId.removed(900001L).values.min
    assert(gib < cleanMin,
      f"gibberish scored $gib%.3f, not below the cleanest-corpus min $cleanMin%.3f")
    val suspects = out.filter(_.getBoolean(3)).map(_.getLong(0))
    assert(suspects.contains(900001L),
      s"gibberish must cross the $$SuspectBar flag, suspects=${suspects.mkString(",")}")
  }

  test("native LM score kernel matches the exploded join+Average chain bit-for-bit") {
    // the DuckDB twin mirrors the portable chain; kernel == portable
    // pins the oracle equivalence — incl. multi-byte code points
    // (substring is char-based in both), the unknown-trigram γ-floor
    // (scored under a DIFFERENT frame's model), and the sub-trigram
    // drop
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .unionByName(Seq(
        (910001L, "añejo müller 中文测试 façade naïve coöperate"),
        (910002L, "zz"),
        (910003L, "unseen trigram content qqq www vvv kkk jjj")
      ).toDF("doc_id", "text"))
    val model = CharLm.lmModelFrom(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
      .localCheckpoint()
    val nat = CharLm.lmScoreWith(docs, model)
      .collect().map(_.toSeq).sortBy(_.toString)
    val port = CharLm.lmScoreWithPortable(docs, model)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(nat.length == port.length && nat.sameElements(port))
    assert(nat.nonEmpty)
  }

  test("char-LM n_grams is exactly length-2 per surviving doc") {
    val docs = Tables.documents(spark, sfDir).limit(20)
    val expect = docs.select(col("doc_id"), (length(col("text")) - 2).cast("long").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CharLm.lmScoreFrom(docs).collect().foreach { r =>
      assert(r.getLong(1) == expect(r.getLong(0)),
        s"doc ${r.getLong(0)}: n_grams ${r.getLong(1)} != len-2 ${expect(r.getLong(0))}")
    }
  }

  // ------------------------------------- 100x planning-stall regression
  test("pointer-jump rounds re-root checkpoint stats (the 100x planning stall)") {
    import spark.implicits._
    // 64-node path: needs multiple jump rounds, so compounding origin
    // stats would have multiplied sizeInBytes digits 3x per round
    val edges = (0L until 63L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("src", "dst")
    val (labels, rounds) = Dedup.propagateMinLabels(edges)
    assert(rounds >= 3, s"path graph should need several rounds, got $rounds")
    assert(labels.select(max(col("lbl"))).head().getLong(0) == 0L,
      "all path vertices must label to component min 0")
    val bits = labels.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(bits <= 64,
      s"label-frame sizeInBytes estimate is $bits bits after $rounds rounds — " +
        "checkpoint origin stats are compounding again (the 100x stall)")
  }

  // ------------------------------------------------------------- O5
  test("maintained IVF assignments equal the full rebuild though every non-delta embedding is poisoned") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    // snapshots by the K9 hash-band device: ids in the add band are
    // new, ids in the remove band departed, ids in the change band
    // re-embedded (sign-flip — same dim, different vector)
    val b = Sampling.hashBucket(col("vec_id"), "ivfcdc")
    val flipped = expr("transform(embedding, v -> CAST(-v AS FLOAT))")
    val oldEmb = emb.where(b >= 8192)
      .select(col("vec_id"), col("embedding"))
    val newEmb = emb.where(b < 57344)
      .select(col("vec_id"),
        when(b >= 24576 && b < 32768, flipped)
          .otherwise(col("embedding")).as("embedding"))
    val delta = oldEmb.select(col("vec_id"), lit("old").as("o"))
      .join(newEmb.select(col("vec_id"), lit("new").as("n")), Seq("vec_id"), "full_outer")
      .withColumn("change",
        when(col("o").isNull, "added")
          .when(col("n").isNull, "removed")
          .when(Sampling.hashBucket(col("vec_id"), "ivfcdc").between(24576, 32767), "changed"))
      .where(col("change").isNotNull)
      .select("vec_id", "change")

    val cents = SimilaritySearch.trainCentroids(spark, oldEmb, 8, 2).localCheckpoint()
    val oldAssigned = SemanticDedup.assignTo(spark, oldEmb, cents)
    val full = SemanticDedup.assignTo(spark, newEmb, cents)

    // poison: zero every embedding the maintenance pass must not read
    val deltaIds = delta.where(col("change").isin("added", "changed")).select("vec_id")
    val poisoned = newEmb.join(deltaIds.withColumn("is_delta", lit(true)),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("is_delta"), col("embedding"))
          .otherwise(expr("transform(embedding, v -> CAST(0.0 AS FLOAT))"))
          .as("embedding"))

    val maintained = SemanticDedup.maintainAssignments(
      spark, oldAssigned, poisoned, delta, cents)

    assert(maintained.count() == full.count())
    val diff = maintained
      .select(col("vec_id"), col("embedding"), col("cid"), round(col("cent_sim"), 9).as("s"))
      .exceptAll(full.select(col("vec_id"), col("embedding"), col("cid"),
        round(col("cent_sim"), 9).as("s")))
      .count()
    assert(diff == 0,
      s"$diff maintained rows disagree with the intact full rebuild — " +
        "maintenance either read a poisoned embedding or mis-derived the survivor set")
  }

  test("O5 drift gate: planted drift trips the refresh, a stable stream does not") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val cents = SimilaritySearch.trainCentroids(spark, emb, 8, 2).localCheckpoint()
    val assigned = SemanticDedup.assignTo(spark, emb, cents).localCheckpoint()

    // stable: a maintained index after a SMALL honest delta (a 5%
    // hash band re-assigned) — populations barely move, gate stays off
    val smallBand = Sampling.hashBucket(col("vec_id"), "driftsmall") < 3277
    val stable = assigned.where(!smallBand)
      .unionByName(SemanticDedup.assignTo(spark, emb.where(smallBand), cents))
    val stableRow = SemanticDedup.assignmentDrift(assigned, stable).head()
    assert(!stableRow.getBoolean(3),
      s"stable stream tripped the gate: tv=${stableRow.getDouble(0)}")

    // planted drift: the corpus's new vintage is sign-flipped — every
    // vector lands far from the generation's centroids (populations
    // reshuffle AND mean assignment cosine collapses)
    val drifted = SemanticDedup.assignTo(spark,
      emb.select(col("vec_id"),
        expr("transform(embedding, v -> CAST(-v AS FLOAT))").as("embedding")),
      cents)
    val driftRow = SemanticDedup.assignmentDrift(assigned, drifted).head()
    assert(driftRow.getBoolean(3),
      s"planted drift did not trip: tv=${driftRow.getDouble(0)}, " +
        s"sim ${driftRow.getDouble(1)} -> ${driftRow.getDouble(2)}")
    assert(driftRow.getDouble(1) - driftRow.getDouble(2) > SemanticDedup.DriftSimDrop,
      "sign-flip must collapse the mean assignment cosine")
    assert(SemanticDedup.needsRefresh(assigned, drifted))
  }

  test("O5 refresh driver: a tripped gate retrains gen g+1 equal to the from-scratch rebuild") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val cents = SimilaritySearch.trainCentroids(spark, emb, 8, 2).localCheckpoint()
    val idx = SemanticDedup.MaintainedIndex(
      SemanticDedup.assignTo(spark, emb, cents).localCheckpoint(), cents, 0)

    // stable 5%-band delta (same embeddings re-delivered): maintenance
    // only — gate off, generation unchanged, index rows unchanged
    val smallBand = Sampling.hashBucket(col("vec_id"), "refreshsmall") < 3277
    val stableDelta = emb.where(smallBand)
      .select(col("vec_id"), lit("changed").as("change"))
    val same = SemanticDedup.maintainWithRefresh(
      spark, idx, emb, stableDelta, k = 8, iters = 2)
    assert(!same.refreshed && same.generation == 0,
      "a stable delta must not bump the generation")
    assert(same.assigned.exceptAll(idx.assigned).count() == 0,
      "stable maintenance changed index rows")

    // planted drift: the whole corpus re-embeds sign-flipped — the
    // gate trips, and the refreshed generation must be BIT-IDENTICAL
    // to training from scratch on the maintained corpus (the trainer
    // is seeded and the assignment tie rule shared)
    val flipped = emb.select(col("vec_id"),
      expr("transform(embedding, v -> CAST(-v AS FLOAT))").as("embedding"))
    val allChanged = emb.select(col("vec_id"), lit("changed").as("change"))
    val next = SemanticDedup.maintainWithRefresh(
      spark, idx, flipped, allChanged, k = 8, iters = 2)
    assert(next.refreshed && next.generation == 1, "planted drift must refresh")
    val scratch = SemanticDedup.assignTo(spark, flipped,
      SimilaritySearch.trainCentroids(spark, flipped, 8, 2))
    def canon(df: DataFrame) = df.select(col("vec_id"), col("cid"),
      round(col("cent_sim"), 9).as("s"))
    assert(canon(next.assigned).exceptAll(canon(scratch)).count() == 0 &&
      next.assigned.count() == scratch.count(),
      "refreshed generation diverges from the from-scratch rebuild")
  }

  // ---------------------------------------------------------------- O8
  test("retrieval_eval metrics are well-formed and a perfect ranking scores 1") {
    val out = graft.operators.Retrieval.retrievalEval(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val dcg = r.getAs[Double]("dcg"); val idcg = r.getAs[Double]("idcg")
      val ndcg = r.getAs[Double]("ndcg")
      assert(idcg > 0 && dcg <= idcg + 1e-9, "dcg must not exceed ideal")
      assert(ndcg >= 0 && ndcg <= 1 + 1e-9)
      assert(math.abs(ndcg - dcg / idcg) < 2e-6)
      val rr = r.getAs[Double]("rr")
      assert(rr == 0.0 || (rr > 0 && rr <= 1.0))
      val p = r.getAs[Double]("p_at_k")
      assert(math.abs(p - r.getAs[Long]("n_hits").toDouble /
        graft.operators.Retrieval.TopK) < 1e-9)
    }
    // the weak label discriminates at the fixture: not every query
    // grades the bag-of-words ranking as perfect
    assert(out.exists(_.getAs[Double]("ndcg") < 0.999),
      "phrase label failed to discriminate")

    // planted corpus: the one phrase doc carries the highest tf too,
    // so BM25 ranks it first -> rr = 1 for query 1
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join filter spark join filter spark join filter"),
      (2L, "spark filter other join words here spark"),
      (3L, "join spark words filter again more"),
      (4L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val r1 = graft.operators.Retrieval.retrievalEvalFrom(spark, docs)
      .where(col("query_id") === 1L).head()
    assert(r1.getAs[Double]("rr") == 1.0, "phrase+tf doc must rank first")
    assert(r1.getAs[Long]("n_hits") == 1L)
  }
}
