package graft

import org.apache.spark.sql.functions._

import graft.operators.{CharLm, DomainMix, QualityClassifier, SpanDedup}

/** S-series: duplicated-substring span removal, perplexity terciles,
  * epoch-capped budget allocation, classifier calibration. */
class SSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val K = SpanDedup.SpanK

  private def toks(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  // ------------------------------------------------------------- S1
  test("span_dedup removes a planted cross-doc passage from every occurrence") {
    val shared = toks(2 * K, "dup") // 16-token passage, > K
    val docs = Seq(
      (1L, s"${toks(5, "a")} $shared ${toks(5, "b")}"),
      (2L, s"${toks(7, "c")} $shared"),
      (3L, toks(30, "uniq"))
    ).toDF("doc_id", "text")
    val out = SpanDedup.spanDedupFrom(spark, docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    // both carriers lose exactly the shared passage (one merged span)
    assert(out(1L).getAs[Long]("n_spans") == 1L)
    assert(out(1L).getAs[Long]("dup_tokens") == 2L * K)
    assert(out(1L).getAs[String]("clean_text") ==
      s"${toks(5, "a")} ${toks(5, "b")}")
    assert(out(2L).getAs[Long]("n_spans") == 1L)
    assert(out(2L).getAs[String]("clean_text") == toks(7, "c"))
    // the unique doc is untouched
    assert(out(3L).getAs[Long]("dup_tokens") == 0L)
    assert(out(3L).getAs[String]("clean_text") == toks(30, "uniq"))
  }

  test("span_dedup merges abutting windows and flags within-doc self-repeats") {
    // one doc that repeats its own K-token phrase twice back-to-back:
    // self-repetition is duplication (the suffix-array semantics), and
    // the two occurrences merge into ONE maximal island
    val phrase = toks(K, "p")
    val docs = Seq(
      (1L, s"$phrase $phrase ${toks(6, "tail")}")
    ).toDF("doc_id", "text")
    val r = SpanDedup.spanDedupFrom(spark, docs).head()
    assert(r.getAs[Long]("n_spans") == 1L, "abutting spans must merge")
    assert(r.getAs[Long]("dup_tokens") == 2L * K)
    assert(r.getAs[String]("clean_text") == toks(6, "tail"))
  }

  test("span_dedup conserves token mass and truncates tail spans") {
    // shared passage ENDS both docs: the island's [p, p+K) windows
    // truncate at n_tokens instead of overshooting
    val shared = toks(K + 3, "z")
    val docs = Seq(
      (1L, s"${toks(4, "x")} $shared"),
      (2L, s"${toks(9, "y")} $shared")
    ).toDF("doc_id", "text")
    val rows = SpanDedup.spanDedupFrom(spark, docs).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_tokens") +
        r.getAs[Long]("dup_tokens") == r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("dup_tokens") == K + 3L)
    }
    // corpus-level conservation on the real fixture
    val full = SpanDedup.spanDedup(spark, sfDir)
    assert(full.where(col("kept_tokens") + col("dup_tokens") =!=
      col("n_tokens")).count() == 0)
    // removal actually edits text: every doc with dup_tokens > 0 has a
    // strictly shorter clean_text token count
    assert(full.where(col("dup_tokens") > 0 &&
      size(split(col("clean_text"), " ", -1)) >= col("n_tokens"))
      .count() == 0)
  }

  // ------------------------------------------------------------- T1
  test("span_dedup_incremental equals the full recompute restricted to the batch") {
    // the incremental anchor rule (old-index hit OR >=2 in batch) is
    // exactly occ_total >= 2 restricted to batch rows - so the
    // incremental output must match the full operator's rows for the
    // batch docs bit-for-bit
    val inc = SpanDedup.spanDedupIncremental(spark, sfDir).cache()
    assert(inc.count() > 0)
    val fullSub = SpanDedup.spanDedup(spark, sfDir)
      .join(inc.select("doc_id"), Seq("doc_id"), "semi")
      .select(inc.columns.map(col): _*)
    assert(fullSub.exceptAll(inc).count() == 0 &&
      inc.exceptAll(fullSub).count() == 0,
      "incremental diverges from the full recompute on the batch")
  }

  // ------------------------------------------------------------- T2
  test("decontaminate_spans cuts the quoted eval item, keeps the page") {
    val kd = graft.operators.SpanDedup.DecontamK
    val evalItem = toks(kd + 4, "ev") // a 9-token "benchmark question"
    val bench = Seq((100L, evalItem)).toDF("doc_id", "text")
    val corpus = Seq(
      // a page QUOTING the eval item mid-text - the GPT-3 case:
      // cut the quote, keep the page
      (1L, s"${toks(6, "pre")} $evalItem ${toks(6, "post")}"),
      // an untouched page
      (2L, toks(20, "clean"))
    ).toDF("doc_id", "text")
    val out = graft.operators.SpanDedup
      .spanDecontaminateFrom(spark, corpus, bench)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_spans") == 1L)
    assert(out(1L).getAs[Long]("contam_tokens") == kd + 4L)
    assert(out(1L).getAs[String]("clean_text") ==
      s"${toks(6, "pre")} ${toks(6, "post")}")
    assert(out(2L).getAs[Long]("contam_tokens") == 0L)
    assert(out(2L).getAs[String]("clean_text") == toks(20, "clean"))
    // partial overlap: only the shared >=K-gram run is cut, not the
    // whole sentence around it
    val part = Seq(
      (3L, s"${toks(8, "x")} ${toks(kd, "ev")} ${toks(8, "y")}")
    ).toDF("doc_id", "text")
    val r3 = graft.operators.SpanDedup
      .spanDecontaminateFrom(spark, part, bench).head()
    assert(r3.getAs[Long]("contam_tokens") == kd.toLong,
      "only the shared prefix run should be cut")
  }

  // ------------------------------------------------------------- S2
  test("ppl_buckets terciles are per-lang monotone and cover every scored doc") {
    val out = CharLm.pplBuckets(spark, sfDir).cache()
    // coverage: every scored doc lands in exactly one bucket
    val scored = CharLm.lmScore(spark, sfDir).count()
    assert(out.count() == scored, "bucketed rows != scored docs")
    // all three buckets materialize for every language at the fixture
    val langs = out.select("lang").distinct().count()
    assert(out.groupBy("lang", "bucket").count()
      .groupBy("lang").count().where(col("count") === 3).count() == langs,
      "a language is missing a tercile")
    // monotone: within a lang, every tail score < every middle score
    // < every head score (cuts are order statistics, ties go down)
    val bounds = out.groupBy("lang").agg(
      max(when(col("bucket") === "tail", col("avg_logp"))).as("t_hi"),
      min(when(col("bucket") === "middle", col("avg_logp"))).as("m_lo"),
      max(when(col("bucket") === "middle", col("avg_logp"))).as("m_hi"),
      min(when(col("bucket") === "head", col("avg_logp"))).as("h_lo"))
    assert(bounds.where(col("t_hi") >= col("m_lo") ||
      col("m_hi") >= col("h_lo")).count() == 0, "tercile overlap")
  }

  // ------------------------------------------------------------- S3
  test("epoch_alloc matches an independent iterative waterfill") {
    val rows = DomainMix.epochAlloc(spark, sfDir).collect()
    val cap = rows.map(r => r.getAs[String]("source") ->
      r.getAs[Long]("cap_tokens")).toMap
    val w = rows.map(r => r.getAs[String]("source") ->
      r.getAs[Double]("weight")).toMap
    val totalAvail = rows.map(_.getAs[Long]("avail_tokens")).sum
    val b = totalAvail * DomainMix.AllocBudgetNum / DomainMix.AllocBudgetDen
    // reference: repeatedly cap any source whose proportional share
    // exceeds its capacity, redistribute, until stable
    var capped = Set.empty[String]
    var changed = true
    while (changed) {
      val r = b - capped.toSeq.map(cap).sum
      val wu = w.keys.filterNot(capped).map(w).sum
      val next = w.keys.filterNot(capped)
        .filter(s => cap(s) <= w(s) * r / wu).toSet
      changed = next.nonEmpty
      capped ++= next
    }
    val rFin = b - capped.toSeq.map(cap).sum
    val wuFin = w.keys.filterNot(capped).map(w).sum
    rows.foreach { row =>
      val s = row.getAs[String]("source")
      val expect = if (capped(s)) cap(s)
        else math.floor(w(s) * rFin / wuFin).toLong
      val got = row.getAs[Long]("alloc_tokens")
      // the engine rounds weight sums to 6dp before dividing; the
      // reference doesn't, so allow the one-token floor boundary
      assert(math.abs(got - expect) <= 1,
        s"$s: engine $got vs reference $expect")
      assert(row.getAs[Boolean]("capped") == capped(s), s"$s capped flag")
      assert(got <= cap(s), s"$s exceeds epoch cap")
    }
    // budget exhausted up to the <#sources floor remainders
    val alloc = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(alloc <= b && b - alloc <= 2L * rows.length,
      s"budget not exhausted: $alloc of $b")
    // non-degenerate at the fixture: the capped set properly splits
    assert(capped.nonEmpty && capped.size < rows.length)
  }

  // ------------------------------------------------------------- S5
  test("span_report surfaces the heaviest duplicated passage with exact mass") {
    val passage = toks(2 * K, "boiler") // 16 tokens, duplicated 3x
    val docs = Seq(
      (1L, s"${toks(4, "a")} $passage"),
      (2L, s"$passage ${toks(5, "b")}"),
      (3L, s"${toks(3, "c")} $passage ${toks(3, "d")}"),
      (4L, toks(25, "uniq"))
    ).toDF("doc_id", "text")
    val top = graft.operators.SpanDedup.spanReportFrom(spark, docs).head()
    assert(top.getAs[String]("passage") == passage)
    assert(top.getAs[Long]("len_tokens") == 2L * K)
    assert(top.getAs[Long]("n_occurrences") == 3L)
    assert(top.getAs[Long]("dup_mass") == 6L * K)
  }

  // ------------------------------------------------------------- S6
  test("epoch_alloc_materialize emits draws that fill each source's allocation") {
    val alloc = DomainMix.epochAlloc(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("alloc_tokens"), r.getAs[Long]("avail_tokens"),
          r.getAs[Boolean]("capped"))).toMap
    val mat = DomainMix.epochAllocMaterialize(spark, sfDir).cache()
    // copies are full_e or full_e + 1, nothing else
    val bad = mat.join(
      DomainMix.epochAlloc(spark, sfDir)
        .select(col("source"),
          expr("alloc_tokens DIV avail_tokens").as("fe")), Seq("source"))
      .where(col("n_copies") =!= col("fe") &&
        col("n_copies") =!= col("fe") + 1).count()
    assert(bad == 0, s"$bad rows with out-of-range copy counts")
    // per-source materialized token mass fills the allocation up to
    // one straddling document
    val bySrc = mat.groupBy("source")
      .agg(sum(col("n_copies") * col("est_tokens")).as("mass"),
        max("est_tokens").as("max_est"))
      .collect()
    bySrc.foreach { r =>
      val s = r.getAs[String]("source")
      val (a, avail, capped) = alloc(s)
      val mass = r.getAs[Long]("mass")
      if (capped) assert(mass == a, s"$s capped but mass $mass != alloc $a")
      else {
        assert(mass <= a, s"$s overfills: $mass > $a")
        assert(a - mass < r.getAs[Long]("max_est"),
          s"$s underfills by more than one doc: $mass of $a")
      }
      assert(avail > 0)
    }
  }

  // ------------------------------------------------------------- S4
  test("qc_calibration bins are well-formed and mass-conserving") {
    val out = QualityClassifier.calibration(spark, sfDir).collect()
    out.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val avgP = r.getAs[Double]("avg_p")
      assert(bin >= 0 && bin <= 9)
      assert(avgP >= bin / 10.0 - 1e-9 &&
        (avgP < (bin + 1) / 10.0 + 1e-9 || bin == 9),
        s"bin $bin mean $avgP outside its bin")
      val frac = r.getAs[Double]("frac_pos")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(math.abs(r.getAs[Double]("abs_gap") -
        math.abs(avgP - frac)) < 1e-6)
    }
    // bin mass sums to the banded (labelable) universe
    val q = graft.operators.TextAnalysis.qualityScore(col("text"))
    val banded = graft.sources.Tables.documents(spark, sfDir)
      .where(q >= QualityClassifier.BandHi || q <= QualityClassifier.BandLo)
      .count()
    assert(out.map(_.getAs[Long]("n")).sum == banded)
  }
  // ------------------------------------------------------------- T4
  test("decontaminate_widths curve is mass-monotone and consistent with T2") {
    val out = SpanDedup.decontaminateWidths(spark, sfDir).collect()
      .map(r => r.getAs[Int]("width") -> r).toMap
    assert(out.keySet == SpanDedup.DecontamWidths.toSet, "missing width row")
    // the corpus token mass is width-independent
    assert(out.values.map(_.getAs[Long]("total_tokens")).toSet.size == 1,
      "total_tokens differs across widths")
    // a width-w anchor implies anchors at every narrower width whose
    // coverage contains it (sub-grams of a bench gram are bench
    // grams), so contaminated mass is non-increasing in width
    val mass = SpanDedup.DecontamWidths.map(out(_).getAs[Long]("contam_tokens"))
    assert(mass.zip(mass.tail).forall { case (a, b) => a >= b },
      s"contaminated mass not monotone in width: $mass")
    // the width-DecontamK row restates the T2 aggregate exactly
    val t2 = SpanDedup.spanDecontaminate(spark, sfDir)
      .agg(sum("contam_tokens"), sum("n_tokens")).head()
    assert(out(SpanDedup.DecontamK).getAs[Long]("contam_tokens") == t2.getLong(0)
      && out(SpanDedup.DecontamK).getAs[Long]("total_tokens") == t2.getLong(1),
      "width-K row diverges from the T2 aggregate")
  }

  test("decontaminate_widths widths discriminate a planted 8-token quote") {
    // bench doc of 20 distinct tokens; a page quotes tokens 5..12 —
    // an 8-token verbatim run. Widths 5 and 8 must cut exactly those
    // 8 tokens; width 13 must cut nothing (no 13-token run is shared,
    // and the corpus doc is long enough that no truncated-witness
    // fallback fires)
    val benchToks = (0 until 20).map(i => s"ev$i")
    val bench = Seq((100L, benchToks.mkString(" "))).toDF("doc_id", "text")
    val quote = benchToks.slice(4, 12).mkString(" ")
    val corpus = Seq(
      (1L, s"${toks(6, "pre")} $quote ${toks(6, "post")}"))
      .toDF("doc_id", "text")
    val byWidth = Seq(5, 8, 13).map { w =>
      w -> SpanDedup.spanDecontaminateFrom(spark, corpus, bench, w)
        .head().getAs[Long]("contam_tokens")
    }.toMap
    assert(byWidth(5) == 8L, s"width 5 cut ${byWidth(5)} tokens, want 8")
    assert(byWidth(8) == 8L, s"width 8 cut ${byWidth(8)} tokens, want 8")
    assert(byWidth(13) == 0L, s"width 13 cut ${byWidth(13)} tokens, want 0")
  }
  // ------------------------------------------------------------- H12
  test("mix_temperature conserves the budget and flattens toward rare sources") {
    // planted skew: one dominant source, two rare ones
    val docs = ((1 to 400).map(i => (i.toLong, "crawl")) ++
      (401 to 450).map(i => (i.toLong, "books")) ++
      (451 to 500).map(i => (i.toLong, "wiki")))
      .toDF("doc_id", "source")
    val out = DomainMix.mixTemperatureFrom(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val draws = out.view.mapValues(_.getAs[Long]("draw_count")).toMap
    // budget conservation is exact (largest-remainder property)
    assert(draws.values.sum == 500L, s"draws $draws must sum to the budget")
    // independent largest-remainder recomputation in BigInt
    val n = Map("crawl" -> 400L, "books" -> 50L, "wiki" -> 50L)
    val w = n.view.mapValues(v =>
      BigInt(math.round(math.pow(v.toDouble, DomainMix.TempAlpha) * DomainMix.TempWScale))).toMap
    val wTot = w.values.sum
    val base = w.view.mapValues(v => BigInt(500) * v / wTot).toMap
    val rem = w.map { case (k, v) => k -> (BigInt(500) * v % wTot) }
    val leftover = (BigInt(500) - base.values.sum).toInt
    val bump = rem.toSeq.sortBy { case (k, r) => (-r, k) }.take(leftover).map(_._1).toSet
    n.keys.foreach { k =>
      val want = base(k) + (if (bump(k)) 1 else 0)
      assert(BigInt(draws(k)) == want, s"$k: draw ${draws(k)} != independent $want")
    }
    // flattening: alpha in (0,1) sits strictly between uniform and
    // proportional for the dominant source, and the repetition factor
    // (epochs) decreases with source size
    val crawlShare = draws("crawl").toDouble / 500
    assert(crawlShare > 1.0 / 3 && crawlShare < 0.8,
      s"crawl share $crawlShare outside (uniform, proportional)")
    assert(out("crawl").getAs[Double]("epochs") < out("books").getAs[Double]("epochs"),
      "dominant source must repeat less than a rare source")
  }
}
