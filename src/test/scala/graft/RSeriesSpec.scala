package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DomainMix, Dsir, Packing}

/** R-series: DSIR importance weights, fixed-length sequence packing
  * with boundary spans, DoReMi-style domain reweighting. */
class RSeriesSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- R2
  test("seq_pack spans tile every sequence exactly and conserve doc tokens") {
    val spans = Packing.seqPack(spark, sfDir).cache()
    val L = Packing.SeqLen

    // within-sequence invariants: spans stay in [0, L), positive width
    val bad = spans.where(col("tok_start") < 0 || col("tok_end") > L ||
      col("tok_start") >= col("tok_end")).count()
    assert(bad == 0, s"$bad malformed spans")

    // every sequence except the LAST is tiled to exactly L tokens with
    // no gaps/overlaps: per-seq width sum == L, and sorted spans are
    // contiguous from 0
    val maxSeq = spans.agg(max("seq_id")).head().getLong(0)
    val widths = spans.where(col("seq_id") < maxSeq)
      .groupBy("seq_id").agg(sum(col("tok_end") - col("tok_start")).as("w"),
        min("tok_start").as("lo"), max("tok_end").as("hi"))
    assert(widths.where(col("w") =!= L || col("lo") =!= 0 || col("hi") =!= L)
      .count() == 0, "a non-final sequence is not tiled to [0, L)")
    // contiguity: within a sequence, sorted-by-start spans abut exactly
    val gaps = spans.withColumn("prev_end", lag("tok_end", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("seq_id").orderBy("tok_start")))
      .where(col("prev_end").isNotNull && col("prev_end") =!= col("tok_start"))
      .count()
    assert(gaps == 0, s"$gaps span gaps/overlaps inside sequences")

    // conservation: each doc's spans sum to its token estimate
    val docTok = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        coalesce(ceil(length(col("text")) / lit(4.0)).cast("long"), lit(0L))
          .as("est"))
    val mismatch = spans.groupBy("doc_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("got"))
      .join(docTok, Seq("doc_id"))
      .where(col("got") =!= col("est")).count()
    assert(mismatch == 0, "doc token mass not conserved across spans")

    // sequence count is exactly ceil(total_tokens / L)
    val total = docTok.agg(sum("est")).head().getLong(0)
    assert(maxSeq + 1 == (total + L - 1) / L,
      s"expected ${(total + L - 1) / L} sequences, got ${maxSeq + 1}")
  }

  test("seq_pack composes with the learned BPE token counter (P1 -> R2)") {
    // swap the chars/4 heuristic for the trained tokenizer through the
    // shared PrefixSum hook: spans must then conserve the BPE counts
    val m = graft.operators.Bpe.model(spark, sfDir)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val spans = Packing.seqPackFrom(docs, tokenCounter =
      Some(graft.operators.Bpe.tokenCountCol(spark, m)))
    val bpeCounts = graft.operators.Bpe.tokenCountsBpeFrom(spark, docs, m)
      .select(col("doc_id"), col("n_bpe_tokens"))
    val mismatch = spans.groupBy("doc_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("got"))
      .join(bpeCounts, Seq("doc_id"))
      .where(col("got") =!= col("n_bpe_tokens")).count()
    assert(mismatch == 0, "sequence spans must conserve LEARNED token counts")
    val maxSeq = spans.agg(max("seq_id")).head().getLong(0)
    val total = bpeCounts.agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(maxSeq + 1 == (total + Packing.SeqLen - 1) / Packing.SeqLen,
      "sequence count must follow the learned token mass")
  }

  // ------------------------------------------------------------- R1
  test("dsir boosts target-vocabulary docs over off-distribution docs") {
    // target band: long, fully-distinct docs (E2 score = 1.0) over
    // vocabulary T; overlap docs: non-target (short) but speaking T;
    // alien docs: non-target, disjoint vocabulary R
    val tVocab = (0 until 100).map(i => s"t$i")
    val target = (0 until 5).map(i => (i.toLong, tVocab.mkString(" ")))
    // each overlap doc speaks a DIFFERENT 4-token slice of the target
    // vocabulary (target unigrams AND bigrams), so its features carry
    // target mass while the doc itself stays out of the quality band
    val overlap = (5 until 10).map(i =>
      (i.toLong, tVocab.slice(4 * (i - 5), 4 * (i - 5) + 4).mkString(" ")))
    val alien = (10 until 15).map(i =>
      (i.toLong, Seq("a", "b", "c", "d").map(s => s"r$i$s").mkString(" ")))
    val docs = (target ++ overlap ++ alien).toDF("doc_id", "text")
    val w = Dsir.dsirWeightsFrom(spark, docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val overlapMin = (5 until 10).map(i => w(i.toLong)).min
    val alienMax = (10 until 15).map(i => w(i.toLong)).max
    assert(overlapMin > alienMax,
      s"target-vocabulary docs must outweigh alien docs: " +
        s"overlap min $overlapMin <= alien max $alienMax")
    (0 until 5).foreach(i => assert(w(i.toLong) > alienMax,
      "target docs themselves must outweigh alien docs"))
  }

  test("dsir weights are engine-stable: n_feats equals the doc's gram count") {
    // unigrams + bigrams over T tokens = T + max(T-1, 1) features
    val out = Dsir.dsirWeights(spark, sfDir)
    val expect = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (size(split(col("text"), " ")) +
          greatest(size(split(col("text"), " ")) - 1, lit(1)))
          .cast("long").as("want"))
    val bad = out.join(expect, Seq("doc_id"))
      .where(col("n_feats") =!= col("want")).count()
    assert(bad == 0, "feature counts diverge from the T + (T-1) contract")
  }

  // ------------------------------------------------------------- R3
  test("domain reweighting: weights form a simplex and follow excess loss") {
    val w = DomainMix.domainReweight(spark, sfDir).collect()
    assert(w.length > 1, "need several sources")
    val sum = w.map(_.getDouble(4)).sum
    assert(math.abs(sum - 1.0) < 1e-4, s"weights must sum to 1, got $sum")
    // monotone: higher excess loss => strictly-not-smaller weight
    val byExcess = w.sortBy(_.getDouble(3))
    byExcess.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) <= b.getDouble(4) + 1e-9,
        s"weight not monotone in excess: ${a.getString(0)} vs ${b.getString(0)}")
    }
    // the hardest domain (max excess) is strictly upweighted past
    // uniform when excesses differ at all
    val uniform = 1.0 / w.length
    if (w.map(_.getDouble(3)).distinct.length > 1)
      assert(byExcess.last.getDouble(4) > uniform,
        "hardest domain must exceed the uniform share")
  }

  test("domainReweightFrom over a materialized score frame equals the self-contained form") {
    val scored = graft.operators.CharLm.lmScore(spark, sfDir)
      .select("doc_id", "avg_logp").cache()
    val fromForm = DomainMix.domainReweightFrom(scored,
      graft.sources.Tables.documents(spark, sfDir).select("doc_id", "source"))
    val self = DomainMix.domainReweight(spark, sfDir)
    assert(fromForm.exceptAll(self).count() == 0 &&
      self.exceptAll(fromForm).count() == 0,
      "composable form diverges from the self-contained form")
  }
  // ------------------------------------------------------------- R5
  test("excess_loss_select is a clean threshold cut that favors the target band") {
    val out = graft.operators.CharLm.excessLossSelect(spark, sfDir).cache()
    // coverage: one row per scoreable doc (>= one trigram)
    val scoreable = graft.sources.Tables.documents(spark, sfDir)
      .where(length(col("text")) >= 3).count()
    assert(out.count() == scoreable, "scored rows != scoreable docs")
    val sel = out.where(col("selected"))
    val unsel = out.where(!col("selected"))
    assert(sel.count() > 0 && unsel.count() > 0, "degenerate selection")
    // threshold semantics: every selected doc outranks every
    // unselected one (scores are 6-dp-rounded, cut is >=, so the
    // separation is strict)
    val minSel = sel.agg(min("excess_logp")).head().getDouble(0)
    val maxUnsel = unsel.agg(max("excess_logp")).head().getDouble(0)
    assert(minSel > maxUnsel,
      s"selection is not a clean cut: min(sel)=$minSel <= max(unsel)=$maxUnsel")
    // the sampled order-statistic cut lands the kept share near 2/5
    val frac = sel.count().toDouble / out.count()
    assert(frac > 0.2 && frac < 0.6, s"keep fraction $frac far from 2/5")
    // RHO-1 ordering gate: the band-trained reference model must price
    // its own band higher than out-of-band mass on average — the
    // likelihood-ratio direction the selection exists to exploit
    val withBand = out.join(
      graft.sources.Tables.documents(spark, sfDir).select(col("doc_id"),
        (graft.operators.TextAnalysis.qualityScore(col("text")) >=
          graft.operators.Dsir.TargetBand).as("t")), "doc_id")
    val m = withBand.groupBy("t").agg(avg("excess_logp").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false),
      "target-band docs must carry higher excess logp than non-band docs")
  }
}
