package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{CorpusStats, Packing, SemanticDedup}
import graft.functions.Vectors

/** Correctness + scale-contract tests for the round-8 I-series:
  * shard packing, stratified quota sampling, corpus-global duplicate
  * n-gram fraction, and semantic dedup. */
class PackingSpec extends SparkSpec {

  test("shardPack two-level prefix sum equals the single global window") {
    // the reference formulation: ONE window over the global hash order
    // (what the DuckDB oracle runs); the bucketed plan must reproduce
    // it exactly because the bucket id is a prefix of the sort key
    val ref = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        ceil(length(col("text")) / lit(4.0)).cast("long").as("est_tokens"),
        md5(concat(col("doc_id").cast("string"), lit(":shard"))).as("h"))
      .withColumn("start_off",
        coalesce(sum("est_tokens").over(
          Window.orderBy(col("h"), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)), lit(0L))
          - col("est_tokens"))
      .select(col("doc_id"), col("est_tokens"),
        floor(col("start_off") / lit(2000.0)).as("shard_id"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("est_tokens").as("shard_tokens"),
        min("doc_id").as("first_doc"))
    val got = Packing.shardPack(spark, sfDir)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "bucketed shard assignment diverged from the global-window reference")
  }

  test("shardPack conserves tokens and covers every doc exactly once") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.select(sum(ceil(length(col("text")) / lit(4.0)).cast("long")))
      .head().getLong(0)
    val got = Packing.shardPack(spark, sfDir)
    assert(got.select(sum("shard_tokens")).head().getLong(0) == total)
    assert(got.select(sum("n_docs")).head().getLong(0) == docs.count())
    // shard ids fit the token range: max id <= total/S
    assert(got.select(max("shard_id")).head().getLong(0) <= total / 2000L)
  }

  test("stratifiedSample hits the exact quota per source (capped by stratum size)") {
    val quota = 3
    val sizes = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("source").agg(count(lit(1)).as("n"))
    val got = Packing.stratifiedSample(spark, sfDir, quota = quota)
      .groupBy("source").agg(count(lit(1)).as("k"))
    val bad = got.join(sizes, Seq("source"))
      .where(col("k") =!= least(col("n"), lit(quota.toLong))).count()
    assert(bad == 0, "some stratum missed its exact quota")
    // deterministic: same hash order -> identical sample across runs
    val again = Packing.stratifiedSample(spark, sfDir, quota = quota)
    assert(Packing.stratifiedSample(spark, sfDir, quota = quota)
      .exceptAll(again).isEmpty)
  }

  test("dupGramFrac matches an independent HOF/count-distinct formulation") {
    // independent build: interpreted HOF shingles (the pre-fusion
    // idiom) + count(DISTINCT doc_id) instead of count(*)
    val grams = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, greatest(size(toks)-4, 1)), i -> concat_ws(' ', slice(toks, i, 5))))")).as("gram"))
    val freq = grams.groupBy("gram")
      .agg(countDistinct("doc_id").as("n_docs"))
    val ref = grams.join(freq, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        (col("n_dup").cast("double") / col("n_grams")).as("dup_frac"))
    val got = CorpusStats.dupGramFrac(spark, sfDir)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "fused dupGramFrac diverged from the HOF reference")
  }

  test("dup-gram signal separates planted near-dups from clean docs") {
    val got = CorpusStats.dupGramFrac(spark, sfDir)
    // the fixture's planted near-dup docs share ALL their 5-grams with
    // their partner -> dup_frac exactly 1.0 for at least one of them
    assert(got.where(col("dup_frac") === 1.0).count() > 0,
      "no fully-duplicated doc found — planted near-dups missed")
    // ...while the bulk of the corpus is clean
    val n = got.count()
    assert(got.where(col("dup_frac") === 0.0).count() > n / 2,
      "majority of docs should have zero cross-doc gram overlap")
    assert(got.where(col("dup_frac") < 0 || col("dup_frac") > 1).count() == 0)
  }

  test("null-text docs flow through token accounting as 0-token rows (both operators)") {
    import spark.implicits._
    // tiny corpus with a null-text doc: the est_tokens coalesce must
    // keep it (cum = running sum unchanged), never NULL its shard/cum
    val dir = java.nio.file.Files.createTempDirectory("graft_nulltext").toFile.getPath
    Seq((0L, Option("alpha beta gamma"), "en", "srcA", 16L),
        (1L, Option.empty[String], "en", "srcA", 0L),
        (2L, Option("delta epsilon"), "en", "srcB", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    try {
      val tb = graft.operators.Sampling.tokenBudget(spark, dir, budget = 1000L)
      assert(tb.count() == 3, "null-text doc must survive the budget cut")
      val nullRow = tb.where(col("doc_id") === 1).head()
      assert(nullRow.getLong(nullRow.fieldIndex("est_tokens")) == 0L)
      assert(!nullRow.isNullAt(nullRow.fieldIndex("cum_tokens")))
      val sp = Packing.shardPack(spark, dir)
      assert(sp.where(col("shard_id").isNull).count() == 0)
      assert(sp.select(sum("n_docs")).head().getLong(0) == 3,
        "null-text doc must be accounted to a real shard")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("topGrams returns the true document-frequency leaders, deterministically") {
    val got = CorpusStats.topGrams(spark, sfDir, k = 10).collect()
    assert(got.length == 10)
    // descending, ties by gram text
    val pairs = got.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sameElements(pairs.sortBy { case (n, g) => (-n, g) }))
    // head count must equal the independent max document frequency
    val trueMax = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, greatest(size(split(text, ' '))-4, 1)), i -> concat_ws(' ', slice(split(text, ' '), i, 5))))")).as("gram"))
      .groupBy("gram").agg(countDistinct("doc_id").as("n"))
      .agg(max("n")).head().getLong(0)
    assert(got.head.getLong(1) == trueMax)
  }

  test("IVF-probe assignment: never beats exact, agrees on the vast majority") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val k = 16
    val cents = graft.operators.SimilaritySearch.trainCentroids(spark, emb, k, iters = 3)
    // exact argmax via the operator's own assigned() (same trainer
    // args -> identical centroids by determinism)
    val exact = SemanticDedup.assigned(spark, sfDir, k, iters = 3)
      .select(col("vec_id"), col("cid").as("cid_x"), col("cent_sim").as("cs_x"))
    // k=16 ⇒ only k'=4 coarse buckets — the hardest routing case
    // (top-p of 4 is far less selective than top-p of √k at real
    // scale). probe=2 measured 0.882 here; the gates below pin the
    // probe dial's monotone recall without overfitting one number.
    val fracs = Seq(2, 3).map { p =>
      val approx = SemanticDedup.assignViaIvf(spark, emb, cents, probe = p)
        .select(col("vec_id"), col("cid").as("cid_a"), col("cent_sim").as("cs_a"))
      val j = exact.join(approx, Seq("vec_id")).localCheckpoint()
      assert(j.count() == emb.count(), "every vector must get an assignment")
      // the probed argmax can never exceed the exact best
      assert(j.where(col("cs_a") > col("cs_x") + 1e-9).count() == 0)
      // agreement: same centroid, or an equal-similarity alternative
      val agree = j.where(col("cid_a") === col("cid_x") ||
        col("cs_a") >= col("cs_x") - 1e-9).count()
      agree.toDouble / j.count()
    }
    assert(fracs(0) >= 0.8, f"probe=2 agreement ${fracs(0)}%.3f below gate")
    assert(fracs(1) >= 0.9, f"probe=3 agreement ${fracs(1)}%.3f below gate")
    assert(fracs(1) >= fracs(0), "agreement must not fall as probe widens")
  }

  test("adaptive probe dial keeps coarse-space coverage constant as k grows") {
    // the rule the 49.7%-at-10x finding demanded: probe ~ k'/4, floor 2
    assert(SemanticDedup.adaptiveProbe(1) == 2)
    assert(SemanticDedup.adaptiveProbe(4) == 2)   // fixture: k=16, k'=4
    assert(SemanticDedup.adaptiveProbe(13) == 4)  // 10x corpus: k=160, k'=13
    assert(SemanticDedup.adaptiveProbe(90) == 23) // 1M vectors: k=8000, k'=90
    // coverage probe/k' never falls below ~1/4 on the ladder
    for (kp <- 1 to 512)
      assert(SemanticDedup.adaptiveProbe(kp) * 4 >= kp,
        s"adaptive probe covers < 1/4 of the coarse space at k'=$kp")
  }

  test("IVF probe at FULL coverage (probe = k') is bit-identical to the exact argmax") {
    // the machinery-exactness contract: approximation must come ONLY
    // from probing a subset of coarse buckets. With every bucket
    // probed, routing and scores must equal assignTo exactly — any
    // residual diff would be a rounding/tie-rule drift bug, not an
    // approximation. (ProbeLab measured the same at 10x: probe=k'=13
    // -> 100.00% routing AND verdict agreement.)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = graft.operators.SimilaritySearch.trainCentroids(spark, emb, 16, iters = 3)
    val exact = SemanticDedup.assignTo(spark, emb, cents)
      .select("vec_id", "cid", "cent_sim")
    val full = SemanticDedup.assignViaIvf(spark, emb, cents, probe = 4) // k'=4
      .select("vec_id", "cid", "cent_sim")
    assert(exact.exceptAll(full).isEmpty && full.exceptAll(exact).isEmpty,
      "full-coverage probe diverged from exact argmax — tie/rounding drift")
  }

  test("assignTo routes (literal small-k vs agg large-k) are bit-identical") {
    // assignTo dispatches on k: the per-row literal argmax (no n·k
    // explode, no shuffle) below LiteralAssignMaxK, the agg+join shape
    // above. The dispatch must be a plan-shape choice only — same
    // graft_cosine, same round(_, 9), same "max cosine, NaN loses,
    // ties to smallest cid" rule — so the two routes must agree to
    // the BIT on (vec_id, cid, cent_sim), embeddings included.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = graft.operators.SimilaritySearch.trainCentroids(spark, emb, 16, iters = 3)
    val lit = SemanticDedup.assignToLiteral(spark, emb, cents)
    val agg = SemanticDedup.assignToAgg(spark, emb, cents)
    // names + types (nullability is a plan artifact either route may
    // annotate differently)
    assert(lit.schema.map(f => (f.name, f.dataType)) ==
           agg.schema.map(f => (f.name, f.dataType)),
      s"route schemas drifted: ${lit.schema} vs ${agg.schema}")
    val l = lit.select("vec_id", "cid", "cent_sim")
    val a = agg.select("vec_id", "cid", "cent_sim")
    assert(l.exceptAll(a).isEmpty && a.exceptAll(l).isEmpty,
      "literal and agg assignment routes diverged — tie/rounding drift")
  }

  test("assignTo memoizes the dispatch probe per centroid frame instance") {
    // a streaming caller reuses ONE centroid frame across micro-
    // batches; the limit(513).collect() dispatch probe must run once
    // for it, not once per batch. The memo is reference-keyed, so a
    // REBUILT frame re-probes (no stale-data hazard).
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = graft.operators.SimilaritySearch.trainCentroids(spark, emb, 8, iters = 2)
    SemanticDedup.dispatchHeads.remove(cents)
    val first = SemanticDedup.assignTo(spark, emb, cents)
    assert(SemanticDedup.dispatchHeads.containsKey(cents),
      "dispatch probe result not memoized after first assignTo")
    val memo = SemanticDedup.dispatchHeads.get(cents)
    val second = SemanticDedup.assignTo(spark, emb, cents)
    assert(SemanticDedup.dispatchHeads.get(cents) eq memo,
      "second assignTo re-ran the dispatch probe on the same frame")
    // and memoization never changes the answer
    assert(first.exceptAll(second).isEmpty && second.exceptAll(first).isEmpty)
    // a different frame over the same data is a fresh key
    val cents2 = graft.operators.SimilaritySearch.trainCentroids(spark, emb, 8, iters = 2)
    assert(!SemanticDedup.dispatchHeads.containsKey(cents2),
      "rebuilt frame must not hit the old memo entry")
  }

  test("probe path at the shipped ProbeAuto default: keep/drop verdicts match the exact regime") {
    // gate what the operator PROMISES (the round-8 adjudication):
    // routing may disagree on near-tie centroids, but the keep/drop
    // verdict — the operator's actual output — must agree. Exact and
    // probed regimes train differently (full corpus vs bounded
    // sample), so this is the honest end-to-end comparison a caller
    // switching regimes experiences.
    val exact = SemanticDedup.semanticDedup(spark, sfDir)
      .select(col("vec_id"), col("keep").as("keep_x"))
    val probed = SemanticDedup.semanticDedup(spark, sfDir,
      probeCoarse = SemanticDedup.ProbeAuto)
      .select(col("vec_id"), col("keep").as("keep_p"))
    val j = exact.join(probed, Seq("vec_id")).localCheckpoint()
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(j.count() == n, "both regimes must emit one verdict per vector")
    val agree = j.where(col("keep_x") === col("keep_p")).count()
    assert(agree.toDouble / n >= 0.95,
      f"verdict agreement ${agree.toDouble / n}%.3f below the 0.95 gate")
  }

  test("incremental semantic dedup: batch verdicts match the kept-old index exactly") {
    val tau = 0.35
    val out = SemanticDedup.semanticDedupIncremental(spark, sfDir, tau = tau)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val old = emb.where(!SemanticDedup.isNewVec(col("vec_id")))
    val batchN = emb.where(SemanticDedup.isNewVec(col("vec_id"))).count()
    assert(out.count() == batchN && batchN > 0, "one verdict per batch vector")
    // rebuild the operator's own kept-old index (training is
    // deterministic, so these are the exact same centroids)
    val cents = graft.operators.SimilaritySearch.trainCentroids(spark, old, k = 16, iters = 3)
    val keptOld = SemanticDedup.incrementalKeptOld(spark, old, cents, tau)
    // per batch vector: the true count of kept-old cluster-mates above
    // tau must equal the reported n_old_matches (0 iff keep)
    val truth = out.join(emb, Seq("vec_id"))
      .join(keptOld, Seq("cid"), "left")
      .withColumn("hit",
        round(graft.functions.Vectors.cosine(col("embedding"), col("old_emb")), 9) > tau)
      .groupBy("vec_id")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("true_matches"),
        min(when(col("hit"), col("old_id"))).as("true_first"))
    val bad = out.join(truth, Seq("vec_id"))
      .where(col("n_old_matches") =!= col("true_matches") ||
        col("keep") =!= (col("true_matches") === 0) ||
        (col("n_old_matches") > 0 &&
          col("first_old_match") =!= col("true_first")))
      .count()
    assert(bad == 0, s"$bad batch vectors disagree with the kept-old index")
    // the asymmetric contract has bite: some batch vectors must
    // actually match old content on this fixture
    assert(out.where(!col("keep")).count() > 0, "no batch near-dup found")
  }

  test("semanticDedup: kept members are pairwise below tau; dropped have a witness (exact AND probed)") {
    val tau = 0.35
    for (probe <- Seq(0, SemanticDedup.ProbeAuto)) checkDedupProperties(
      SemanticDedup.semanticDedup(spark, sfDir, tau = tau, probeCoarse = probe), tau)
  }

  private def checkDedupProperties(out: org.apache.spark.sql.DataFrame,
                                   tau: Double): Unit = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val scored = out.join(emb, Seq("vec_id"))
    val kept = scored.where(col("keep"))
      .select(col("cid"), col("vec_id"), col("embedding"))
    // no kept-kept pair within a cluster above tau
    val hot = kept.as("a").join(kept.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .where(round(Vectors.cosineFast(spark,
        col("a.embedding"), col("b.embedding")), 9) > tau)
      .count()
    assert(hot == 0, s"$hot kept pairs above tau survived dedup")
    // every dropped member is within tau of SOME cluster-mate (the
    // earlier-ranked witness is in particular a cluster-mate)
    val dropped = scored.where(!col("keep"))
      .select(col("cid"), col("vec_id"), col("embedding"))
    val all = scored.select(col("cid"), col("vec_id").as("w_id"),
      col("embedding").as("w_emb"))
    val orphans = dropped.join(all, Seq("cid"))
      .where(col("vec_id") =!= col("w_id") &&
        round(Vectors.cosineFast(spark, col("embedding"), col("w_emb")), 9) > tau)
      .select("vec_id").distinct()
    val unWitnessed = dropped.select("vec_id").exceptAll(orphans).count()
    assert(unWitnessed == 0, s"$unWitnessed dropped vectors have no near neighbor")
    // the fixture's planted near-dup embeddings must actually dedup
    assert(dropped.count() > 0, "fixture has planted near-dups; none dropped")
  }
}
