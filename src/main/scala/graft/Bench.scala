package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{ceil, col, length, lit, sum}
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and emits ONE JSON line (stdout) plus a file copy (BENCH.json or
  * $SPARK_GRAFT_BENCH_OUT) so the driver's parse is log-format
  * independent. A failing query records an "errors" entry instead of
  * masquerading as a fast timing.
  *
  * Load guard: the round-9 artifact was recorded on a host at loadavg
  * 8 and showed phantom 20-46× "regressions" (a contention window
  * sweeping a contiguous alphabetical block of queries; one rep of a
  * 1.8 s query measured 344 s). A contaminated run must never again
  * masquerade as a regression record, so the bench now (a) records
  * the 1-min loadavg after every rep ("loads" in the file copy),
  * (b) emits "load_skewed": true when the starting load exceeds
  * SPARK_GRAFT_BENCH_MAX_LOAD (default 4.0) or any query's rep
  * spread exceeds SPARK_GRAFT_BENCH_MAX_SPREAD (default 5×, floored
  * at 1 s so sub-second jitter can't trip it), naming the offenders
  * in "skew_queries", and (c) refuses to run at all — exit 2, no
  * record written — when SPARK_GRAFT_BENCH_REFUSE_LOAD=1 and the
  * host is already loaded (opt-in so the driver's unattended run
  * degrades to a flagged record, never to a missing one). Round 17
  * added `calib_sec` — a fixed single-threaded pure-JVM workload
  * timed per run — because a SECOND contamination class surfaced that
  * no loadavg can see: a clean-load host simply running ~1.3× slower
  * than in the record's window (measured by re-benching the previous
  * round's code). Cross-epoch record comparisons should normalize by
  * the calib_sec ratio before reading any per-query delta as a
  * regression.
  *
  * Composition pricing: the three multi-stage composites
  * (q_pipeline_pack / q_corpus_report / q_drop_ledger) deliberately
  * recompute their stages — honest for a one-shot query, but NOT the
  * number a 100 TB operator pays, where stages persist once and every
  * consumer reads them. The bench therefore also materializes the
  * shared stage outputs ONCE (untimed: stage persists are lazy vals,
  * and each form gets one untimed discard run that forces exactly the
  * stages it needs before its timing loop), then times the production
  * `*From` compositions alone over the persisted parquet
  * ("from_curate", "from_pipeline_pack", "from_corpus_report",
  * "from_drop_ledger") — rows-only entries (their equality to the
  * self-contained forms is spec-pinned: PipelineOpsSpec, MSeriesSpec).
  * Disable with SPARK_GRAFT_BENCH_FROM=0.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // Host load before/after the run: the shared host shows up-to-2×
    // variance, and a skewed run is only interpretable next to the
    // loadavg it ran under (1/5/15-min averages from the OS).
    def loadavg: String =
      scala.util.Try(Files.readString(Paths.get("/proc/loadavg"))
        .split("\\s+").take(3).mkString("[", ",", "]")).getOrElse("null")
    def load1: Double =
      scala.util.Try(Files.readString(Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble).getOrElse(-1.0)
    val loadStart = loadavg
    val load1Start = load1
    val maxLoad = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "4.0").trim.toDouble)
      .getOrElse(4.0)
    val maxSpread = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_SPREAD", "5.0").trim.toDouble)
      .getOrElse(5.0)
    if (load1Start > maxLoad && sys.env.get("SPARK_GRAFT_BENCH_REFUSE_LOAD").contains("1")) {
      System.err.println(
        s"[bench] REFUSING: host 1-min load $load1Start > $maxLoad — timings " +
          "recorded now would be contention noise, not a regression record " +
          "(unset SPARK_GRAFT_BENCH_REFUSE_LOAD to run flagged instead)")
      sys.exit(2)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.operators.OracleContext.dir.set(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Subset probes (SPARK_GRAFT_BENCH_ONLY) must NOT clobber the
    // committed full-suite artifact — they default to /tmp unless the
    // caller names an output explicitly. (A 2-query 100× probe
    // overwrote BENCH.json in two separate rounds before this guard.)
    def defaultOut: String =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) "/tmp/graft_bench_probe.json"
      else "BENCH.json"
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorbs JVM/codegen/parquet-footer startup cost so
    // the first timed query isn't charged for it.
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    // Best-of-N per query: the host shows up-to-2x run-to-run variance
    // (r2: 56 s for a 100k-row scan that takes 1.3 s steady-state), so a
    // single shot cannot distinguish noise from regression. All runs are
    // reported ("runs") so the spread itself is visible; "queries" keeps
    // the per-query minimum and "value" their sum.
    val reps = scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").trim.toInt)
      .getOrElse(3).max(1)
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val allRuns = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val allLoads = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timeQuery(name: String, mk: () => DataFrame): Unit = {
      val runs = scala.collection.mutable.ArrayBuffer[Double]()
      val loads = scala.collection.mutable.ArrayBuffer[Double]()
      var failed = false
      var r = 0
      while (r < reps && !failed) {
        val t0 = System.nanoTime()
        try {
          mk().write.mode("overwrite").format("noop").save()
          runs += (System.nanoTime() - t0) / 1e9
          loads += load1
        } catch {
          case e: Throwable =>
            failed = true
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        r += 1
      }
      if (runs.nonEmpty && !failed) {
        timings(name) = runs.min
        allRuns(name) = runs.toSeq
        allLoads(name) = loads.toSeq
      }
    }
    // Optional subset (comma-separated names) for local iteration; the
    // driver leaves it unset and gets the full suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet -- FromForms
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: ${unknown.mkString(", ")}")
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) => timeQuery(name, () => fn(spark, sfDir)) }
    if (!sys.env.get("SPARK_GRAFT_BENCH_FROM").contains("0")
        && only.forall(_.exists(FromForms.contains)))
      benchFromForms(spark, sfDir, only, timeQuery)
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // Millisecond precision on the wire: the driver captures only a
    // bounded TAIL of stdout, and r3's full-precision line (with the
    // per-rep "runs" object) overflowed it — the driver recorded
    // "parsed": null. The stdout line stays compact (rounded values, no
    // runs); the file copy keeps every rep at full precision.
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Host-speed calibration: the round-17 drift was a clean-load host
    // running ~1.3x slower than the record window — invisible to every
    // loadavg guard. calib_sec times a FIXED pure-JVM workload (min of
    // 3), so cross-epoch record comparisons can normalize by the
    // calib ratio instead of mistaking epoch drift for regression.
    val calibSec = calibrate()
    val loadEnd = loadavg
    val (loadSkewed, skewQueries) =
      skewVerdict(allRuns.toSeq, load1Start, maxLoad, maxSpread)
    if (loadSkewed) System.err.println(
      s"[bench] WARNING load_skewed: load_start=$load1Start (bar $maxLoad), " +
        s"spread>${maxSpread}x on [${skewQueries.mkString(", ")}] — treat " +
        "timings as contaminated; re-run on a quiet host")
    val qs = timings.map { case (k, v) => s"${jstr(k)}:${r3(v)}" }.mkString("{", ",", "}")
    val rs = allRuns.map { case (k, v) => s"${jstr(k)}:${v.mkString("[", ",", "]")}" }.mkString("{", ",", "}")
    val ls = allLoads.map { case (k, v) => s"${jstr(k)}:${v.mkString("[", ",", "]")}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val sq = skewQueries.map(jstr).mkString("[", ",", "]")
    val total = timings.values.sum
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"reps":$reps,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"load_start":$loadStart,"load_end":$loadEnd,"load_skewed":$loadSkewed,"skew_queries":$sq,"calib_sec":${r3(calibSec)},"sf":${jstr(sfDir)}}"""
    println(line)
    // File copy keeps every value at full precision (calib_sec raw, not
    // r3'd — cross-epoch normalization divides by it).
    Files.writeString(Paths.get(out),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$rs,"loads":$ls,"reps":$reps,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"load_start":$loadStart,"load_end":$loadEnd,"load_skewed":$loadSkewed,"skew_queries":$sq,"calib_sec":$calibSec,"sf":${jstr(sfDir)}}""" + "\n")
    spark.stop()
    if (errors.nonEmpty) System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
  }

  /** Fixed pure-JVM calibration workload (xorshift chain, ~1 s on the
    * reference host), min of 3 runs. Single-threaded and allocation-
    * free on purpose: it measures the per-core speed the Spark tasks
    * see, not the scheduler. Deterministic, so the only variable is
    * the host. */
  private[graft] def calibrate(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < 300000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        i += 1
      }
      // data dependency so the loop cannot be eliminated
      if (x == 42L) System.err.println("calib sentinel")
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).map(_ => once()).min
  }

  /** Skew verdict: starting load alone, or any query whose rep spread
    * (max/min over reps) exceeds the bar with a non-trivial max (≥1 s,
    * so sub-second jitter can't trip it) — the signature of a
    * contention window sweeping the suite, not a plan change.
    * Factored out of main so BenchGuardSpec can pin the behavior on
    * the round-9 contamination shape. */
  private[graft] def skewVerdict(runs: Seq[(String, Seq[Double])],
                                 load1Start: Double, maxLoad: Double,
                                 maxSpread: Double): (Boolean, Seq[String]) = {
    // The first rep pays one-time codegen/JIT compile for the query's
    // expression tree (observed 7x on lambda-heavy plans), and the
    // reported timing is runs.min which never includes it — so the
    // verdict reads the POST-WARMUP reps. Contention that only touches
    // rep 1 can't contaminate the min either.
    val skewQueries = runs.collect {
      case (name, rs0) if rs0.size >= 3 => (name, rs0.tail)
      case (name, rs0) => (name, rs0)
    }.collect {
      case (name, rs) if rs.size >= 2 && rs.max >= 1.0 &&
        rs.max / math.max(rs.min, 1e-9) > maxSpread => name
    }
    (load1Start > maxLoad || skewQueries.nonEmpty, skewQueries)
  }

  /** The production-composition entries (rows-only; no oracle — their
    * equality to the self-contained forms is spec-pinned). */
  private val FromForms = Set(
    "from_curate", "from_pipeline_pack", "from_corpus_report", "from_drop_ledger",
    "from_quality_classifier", "from_text_tokens_bpe", "from_ann_ivf_index",
    "from_domain_reweight", "from_ppl_buckets", "from_qc_calibration",
    "from_span_incremental", "from_alloc_materialize", "from_hard_negatives",
    "from_dedup_semantic", "from_epoch_alloc", "from_lm_quality",
    "from_winnow_incremental", "from_ann_bq", "from_profile_sketch",
    "from_langid_trained", "from_removal_audit", "from_removal_audit_v2",
    "from_video_meta")

  /** Materialize the shared stage outputs once (untimed), then time
    * ONLY the `*From` compositions over the persisted parquet — the
    * cost a 100 TB operator pays per consumer once stages are shared. */
  private def benchFromForms(spark: SparkSession, sfDir: String,
                             only: Option[Set[String]],
                             timeQuery: (String, () => DataFrame) => Unit): Unit = {
    import graft.operators._
    val fromDir = Files.createTempDirectory("graft_bench_from")
    def persist(name: String, df: DataFrame): DataFrame = {
      df.write.mode("overwrite").parquet(s"$fromDir/$name")
      spark.read.parquet(s"$fromDir/$name")
    }
    try {
      lazy val docs = persist("documents",
        graft.sources.Tables.documents(spark, sfDir)
          .select("doc_id", "source", "lang", "text"))
      lazy val quality = persist("quality", TextAnalysis.quality(spark, sfDir))
      lazy val exact = persist("exact", Dedup.exact(spark, sfDir))
      lazy val clusters = persist("clusters", Dedup.dupClusters(spark, sfDir))
      lazy val decont = persist("decont", Dedup.decontaminate(spark, sfDir))
      lazy val drift = persist("drift", CorpusStats.sourceDrift(spark, sfDir))
      lazy val semDrops = persist("sem_drops", Pipeline.semanticDrops(spark, sfDir))
      lazy val curated = persist("curated",
        Curation.curateFrom(docs, quality, exact, decont))
      // the learned models' steady-state price: train ONCE (untimed —
      // the refresh-cadence cost), time only the frozen-model scoring
      // pass every consumer pays
      lazy val qcModel = QualityClassifier.model(spark, sfDir)
      lazy val bpeModel = Bpe.model(spark, sfDir)
      lazy val lidModel = LangId.model(spark, sfDir)
      // M4's standing artifacts (the governance state a deployment
      // maintains on disk)
      lazy val rmEx = persist("rm_exact", Dedup.exactFrom(docs))
      lazy val rmTok = persist("rm_tok", CorpusStats.tokenCounts(docs))
      lazy val rmFp = persist("rm_fp", Winnowing.fpValuesFrom(spark, docs))
      lazy val rmSpan = persist("rm_span", SpanDedup.spanGramIndex(spark, docs))
      // M6's vector-side standing artifacts: band index, chunk index,
      // and one trained IVF assignment generation (training is the
      // untimed refresh-cadence cost; removal never retrains)
      lazy val rmBand = persist("rm_band", Dedup.bandsOf(spark, docs))
      lazy val rmChunk = persist("rm_chunk",
        Chunking.cdcChunks(docs).select("doc_id", "sig", "ctok"))
      lazy val rmCents = persist("rm_cents",
        SemanticDedup.trainedCentsDf(spark, sfDir))
      lazy val rmEmb = persist("rm_emb",
        graft.sources.Tables.embeddings(spark, sfDir)
          .select("vec_id", "embedding"))
      // F8's stored corpus: at a deployment the clips are BYTES ON
      // DISK; the persist is the untimed synthesis of that corpus
      lazy val vidBlobs = persist("vid_blobs",
        VideoDedup.videoTable(spark, sfDir).toDF)
      lazy val rmIvf = persist("rm_ivf",
        SemanticDedup.assignTo(spark, rmEmb, rmCents)
          .select("vec_id", "embedding", "cid", "cent_sim"))
      // D7's serving price: build the `cid=`-partitioned on-disk index
      // ONCE (untimed — index builds happen at maintenance cadence),
      // then time the PROBE-ONLY search whose literal cid predicate
      // prunes index files at listing time (IvfLayoutSpec pins the
      // pruning; this entry prices it)
      val wantIvf = only.forall(o => o.contains("from_ann_ivf_index")
        || o.contains("from_hard_negatives"))
      if (wantIvf)
        SimilaritySearch.writeIvfIndex(spark, sfDir, s"$fromDir/ivfidx")
      // Z1's packed-words index: built once at maintenance cadence
      // (untimed); the timed serve scans 8 B/vector + rescores floats
      // for the shortlist only
      if (only.forall(_.contains("from_ann_bq")))
        BinaryAnn.writeBqIndex(spark, sfDir, s"$fromDir/bqidx")
      // I4's steady state: centroid training + assignment persist at
      // index-maintenance cadence (untimed); the timed form is the
      // dedup RULE alone over the persisted assigned frame — the
      // per-refresh price once the clustering is shared
      lazy val semAssigned = persist("sem_assigned",
        SemanticDedup.assigned(spark, sfDir, 0, 3))
      lazy val lmScores = persist("lm_scores",
        CharLm.lmScore(spark, sfDir).select("doc_id", "avg_logp"))
      // O4's trained artifact itself (vocabulary-bounded gram table):
      // persisted at refresh cadence, broadcast by every consumer
      lazy val lmLogp = persist("lm_logp", CharLm.lmModelFrom(docs))
      // Y5's persisted corpus fingerprint index (fp-bucketed at scale)
      lazy val fpIdx = persist("fp_index",
        Winnowing.fpValuesFrom(spark,
          docs.where(!Winnowing.isWinNew(col("doc_id"))))
          .select("fp").distinct())
      lazy val spanIdx = persist("span_index",
        SpanDedup.spanGramIndex(spark,
          docs.where(!SpanDedup.isNewBatch(col("doc_id")))))
      lazy val allocTable = persist("alloc_table",
        DomainMix.epochAlloc(spark, sfDir))
      lazy val allocWeights = persist("alloc_weights",
        DomainMix.domainReweight(spark, sfDir).select("source", "weight"))
      lazy val allocAvail = persist("alloc_avail",
        graft.sources.Tables.documents(spark, sfDir).groupBy("source")
          .agg(sum(ceil(length(col("text")) / lit(4.0)).cast("long"))
            .as("avail_tokens")))
      val forms: Seq[(String, () => DataFrame)] = Seq(
        "from_curate" -> (() => Curation.curateFrom(docs, quality, exact, decont)),
        "from_pipeline_pack" -> (() => Pipeline.pipelinePackFrom(docs, curated, semDrops)),
        "from_corpus_report" -> (() =>
          Reporting.corpusReportFrom(docs, quality, exact, clusters, decont, drift)),
        "from_drop_ledger" -> (() =>
          Reporting.dropLedgerFrom(decont, exact, clusters, semDrops, quality)),
        "from_quality_classifier" -> (() =>
          QualityClassifier.classifyFrom(docs, qcModel)),
        "from_text_tokens_bpe" -> (() =>
          Bpe.tokenCountsBpeFrom(spark, docs, bpeModel)),
        "from_ann_ivf_index" -> (() =>
          SimilaritySearch.ivfIndexTopK(spark, s"$fromDir/ivfidx")),
        // U4's serving price: banded hard-negative mining probe-only
        // over the same prebuilt on-disk IVF index
        "from_hard_negatives" -> (() =>
          SimilaritySearch.hardNegativesFromIndex(spark, s"$fromDir/ivfidx")),
        "from_dedup_semantic" -> (() =>
          SemanticDedup.dedupAssigned(spark, semAssigned,
            SemanticDedup.DefaultTau)),
        // R3's steady state: the char-LM scores persist once (the O4
        // pass every consumer shares); reweighting itself is a join +
        // #sources-row arithmetic
        "from_domain_reweight" -> (() =>
          DomainMix.domainReweightFrom(lmScores,
            docs.select("doc_id", "source"))),
        // S2 steady state over the same persisted scores: sample-cut
        // derivation + a broadcast-compare bucketing pass
        "from_ppl_buckets" -> (() =>
          CharLm.pplBucketsFrom(lmScores, docs.select("doc_id", "lang"))),
        // O4 steady state: score-only under the persisted gram table
        // (the last trained-artifact query to get a priced from-form)
        "from_lm_quality" -> (() => CharLm.lmScoreWith(docs, lmLogp)),
        // Y5 steady state: the per-batch price — only the new batch's
        // narrow fingerprint pass + the probe join against the
        // persisted index
        "from_winnow_incremental" -> (() =>
          Winnowing.winnowIncrementalWith(spark,
            docs.where(Winnowing.isWinNew(col("doc_id"))), fpIdx)),
        // S4 steady state: score-and-bin under the already-trained model
        "from_qc_calibration" -> (() =>
          QualityClassifier.calibrationFrom(docs, qcModel)),
        // T1 steady state: the per-crawl-batch cost — one gram pass
        // over the ~20% batch + a bucketed join against the PERSISTED
        // corpus gram index (built untimed at ingest cadence)
        "from_span_incremental" -> (() =>
          SpanDedup.spanDedupIncrementalFrom(spark,
            docs.where(SpanDedup.isNewBatch(col("doc_id"))), spanIdx)),
        // S6 steady state: the two-level residual rank + joins over a
        // decided allocation table (#sources rows, persisted)
        "from_alloc_materialize" -> (() =>
          DomainMix.epochAllocMaterializeFrom(docs, allocTable)),
        // S3's steady state: weights come from the (from_domain_
        // reweight-priced) trainer and avail from one persisted count
        // pass; the allocator itself runs on #sources rows
        "from_epoch_alloc" -> (() =>
          DomainMix.epochAllocFrom(allocWeights, allocAvail)),
        // Z1 steady state: hamming scan over the persisted packed
        // index, floats touched only for the rescore shortlist
        "from_ann_bq" -> (() =>
          BinaryAnn.bqTopKFromIndex(spark, sfDir, s"$fromDir/bqidx")),
        // H7's production cadence: the SKETCH-ONLY profile every
        // monitoring tick pays (constant-memory, merge-in-partial-agg);
        // q_profile_approx keeps pricing the hash-gated AUDIT form
        // (sketch + exact + verdicts), which a deployment runs at
        // audit cadence, not per tick — BENCH carries both prices
        "from_profile_sketch" -> (() => Sampling.approxProfile(spark, sfDir)),
        // Y1 steady state: the NB model is a refresh-cadence artifact
        // (trained once untimed via the lazy val); the timed pass is
        // the frozen-model scoring every corpus tick pays — one narrow
        // native gram+score kernel pass
        "from_langid_trained" -> (() =>
          LangId.langidTrainedFrom(docs, lidModel)),
        // M4 steady state: the standing artifacts persist once
        // (untimed — they ARE the deployment's on-disk state); the
        // timed pass is one removal batch's maintenance + audit — the
        // O(|removed| + touched state) price per takedown batch
        "from_removal_audit" -> (() =>
          Removal.removalAuditWith(spark, rmEx, rmTok, rmFp, rmSpan,
            docs, docs.where(Removal.isForgotten(col("doc_id")))
              .select("doc_id"))),
        // M6 steady state: three O(|removed| + touched state)
        // maintenance passes (two anti-joins + the empty-arrival
        // assignment maintainer) + the audit aggregates
        "from_removal_audit_v2" -> (() =>
          Removal.removalAuditV2With(spark, rmBand, rmChunk, rmIvf, rmEmb,
            docs.where(Removal.isForgotten(col("doc_id"))).select("doc_id"),
            rmEmb.where(Removal.isForgotten(col("vec_id"))).select("vec_id"),
            rmCents)),
        // F8 steady state: the structural metadata walk over the
        // stored blob corpus — no encode, no pixel decode
        "from_video_meta" -> (() =>
          VideoDedup.videoMetaFrom(spark, vidBlobs)))
      forms.filter { case (n, _) => only.forall(_.contains(n)) }
        .foreach { case (n, mk) =>
          // Force the form's stage dependencies (the lazy parquet
          // persists and model trainings above) OUTSIDE the timed
          // region: one untimed discard run per form materializes
          // exactly what it needs, so rep 1 prices the steady-state
          // composition — never the stage build. (A failure here is
          // left for timeQuery to record as the form's error.)
          try mk().write.mode("overwrite").format("noop").save()
          catch { case _: Throwable => () }
          timeQuery(n, mk)
        }
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] from-form setup failed: ${e.getMessage}")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(fromDir.toFile)
    }
  }
}
