package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Behavioral tests for the H-series training-pipeline operators
  * (decontamination, incremental dedup, fuzzy matching, repetition,
  * scrubbing, sketch profiling) on planted fixtures — the oracle gate
  * proves engine parity on the shared corpus; these prove the
  * operators actually catch what they claim to catch. */
class PipelineOpsSpec extends SparkSpec {

  /** Test-side mirror of Sampling.hashBucket: first 2 md5 bytes of
    * "<id>:<salt>" — used to PLANT docs on chosen sides of the
    * deterministic hash splits. */
  private def bucket(id: Long, salt: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$salt".getBytes("UTF-8"))
    ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
  }
  private def findId(from: Long, pred: Long => Boolean): Long =
    Iterator.iterate(from)(_ + 1).find(pred).get

  private def withDocs[A](docs: Seq[(Long, String)])(f: String => A): A = {
    val dir = Files.createTempDirectory("graft_pipe").toFile
    try {
      import spark.implicits._
      docs.map { case (id, text) => (id, text, "en", "fix", text.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      f(dir.getPath)
    } finally {
      def rm(g: java.io.File): Unit = {
        if (g.isDirectory) g.listFiles().foreach(rm); g.delete()
      }
      rm(dir)
    }
  }

  test("sampling bucket test-mirror matches the operator's bucket") {
    val got = Sampling.hashSample(spark, sfDir, pct = 100)
      .select("doc_id", "bucket").collect()
    assert(got.nonEmpty)
    got.foreach(r =>
      assert(r.getLong(1) == bucket(r.getLong(0), "graft").toLong))
  }

  test("decontaminate flags a corpus copy of a benchmark doc") {
    val benchId = findId(0, bucket(_, "bench") < Sampling.pctThreshold(5))
    val cleanId = findId(benchId + 1, id =>
      bucket(id, "bench") >= Sampling.pctThreshold(5))
    val copyId = findId(cleanId + 1, id =>
      bucket(id, "bench") >= Sampling.pctThreshold(5))
    val benchText = (0 until 12).map(t => s"b$t").mkString(" ")
    val otherText = (0 until 12).map(t => s"z$t").mkString(" ")
    withDocs(Seq(benchId -> benchText, copyId -> benchText,
      cleanId -> otherText)) { dir =>
      val hits = Dedup.decontaminate(spark, dir).collect()
      assert(hits.length == 1, s"expected exactly the planted hit, got ${hits.toSeq}")
      val h = hits.head
      assert(h.getLong(0) == copyId && h.getLong(1) == benchId)
      assert(h.getDouble(3) == 1.0, "full copy must have containment 1.0")
      assert(h.getBoolean(4), "full copy must be flagged contaminated")
    }
  }

  test("incremental dedup matches new docs against old corpus only") {
    val thr = Sampling.pctThreshold(20)
    val newDup = findId(0, bucket(_, "batch") < thr)
    val newFresh = findId(newDup + 1, bucket(_, "batch") < thr)
    val newPairA = findId(newFresh + 1, bucket(_, "batch") < thr)
    val newPairB = findId(newPairA + 1, bucket(_, "batch") < thr)
    val oldSrc = findId(newPairB + 1, bucket(_, "batch") >= thr)
    val dupText = (0 until 12).map(t => s"d$t").mkString(" ")
    val pairText = (0 until 12).map(t => s"p$t").mkString(" ")
    val freshText = (0 until 12).map(t => s"f$t").mkString(" ")
    withDocs(Seq(
      newDup -> dupText, oldSrc -> dupText, // new copies old -> dup
      newPairA -> pairText, newPairB -> pairText, // new x new: NOT a corpus dup
      newFresh -> freshText)) { dir =>
      val rows = Dedup.incrementalDedup(spark, dir).collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(rows.keySet == Set(newDup, newFresh, newPairA, newPairB),
        s"every batch doc must appear exactly once: ${rows.keySet}")
      assert(rows(newDup).getBoolean(3), "copy of an old doc must be flagged")
      assert(rows(newDup).getLong(2) == oldSrc, "canonical must be the old source")
      assert(!rows(newFresh).getBoolean(3), "fresh doc must not be flagged")
      assert(!rows(newPairA).getBoolean(3) && !rows(newPairB).getBoolean(3),
        "new x new duplicates are the batch's own C2 pass, not corpus dups")
    }
  }

  test("fuzzy pairs finds near-identical prefixes within a block") {
    // same first-2-token block key, same length bucket, 2 edits apart
    // (all 28 chars — inside the 40-char comparison prefix)
    val a = "alpha beta gamma delta epsXY"
    val b = "alpha beta gamma delta epsZW"
    val c = "omega beta gamma delta epsXY" // different block
    withDocs(Seq(1L -> a, 2L -> b, 3L -> c)) { dir =>
      val pairs = Dedup.fuzzyPairs(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(pairs.toSeq == Seq((1L, 2L, 2L)),
        s"expected exactly the planted in-block pair at distance 2, got ${pairs.toSeq}")
    }
  }

  test("repetition flags loops, passes distinct text") {
    val loopy = Seq.fill(10)("spam ham").mkString(" ") // 2-gram/3-gram loops
    val clean = (0 until 20).map(t => s"u$t").mkString(" ")
    withDocs(Seq(1L -> loopy, 2L -> clean)) { dir =>
      val byId = TextAnalysis.repetition(spark, dir).collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(byId(1L).getBoolean(7), "looping text must be flagged repetitive")
      assert(!byId(2L).getBoolean(7), "all-distinct text must pass")
      assert(byId(2L).getDouble(3) == 0.0 && byId(2L).getDouble(6) == 0.0)
      // 20 tokens of a 2-word loop: 19 bigrams, 2 distinct
      assert(byId(1L).getLong(1) == 19 && byId(1L).getLong(2) == 2)
    }
  }

  test("scrub redacts planted PII and masks blocklist terms") {
    val t1 = "contact me at alice.smith+x@example.org or 555-123-4567 now"
    val t2 = "the big dog ran slow big uphill"
    withDocs(Seq(1L -> t1, 2L -> t2)) { dir =>
      val byId = TextAnalysis.scrub(spark, dir).collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(byId(1L).getLong(1) == 1 && byId(1L).getLong(2) == 1)
      assert(byId(1L).getString(4) ==
        "contact me at <EMAIL> or <PHONE> now")
      assert(byId(1L).getBoolean(5))
      // adjacent blocked terms both masked (the token-level pass's
      // whole reason to exist over a padded substring replace)
      assert(byId(2L).getLong(3) == 3)
      assert(byId(2L).getString(4) == "the <TERM> dog ran <TERM> <TERM> uphill")
    }
  }

  test("curation funnel drops dups, contamination, and low quality; keeps the rest") {
    // every non-bench id is pinned OUTSIDE the 5% bench sample, so no
    // accidental bench membership can make an unrelated doc
    // "contaminated" and fail an assertion for the wrong reason
    val notBench = (id: Long) => bucket(id, "bench") >= Sampling.pctThreshold(5)
    val benchId = findId(0, bucket(_, "bench") < Sampling.pctThreshold(5))
    val copyId = findId(benchId + 1, notBench)
    val dupA = findId(copyId + 1, notBench)
    val dupB = findId(dupA + 1, notBench)
    val junkId = findId(dupB + 1, notBench)
    val keepId = findId(junkId + 1, notBench)
    val benchText = (0 until 12).map(t => s"b$t").mkString(" ")
    // NOT an exact dup of the bench doc (extra tail) — so only the
    // decontamination stage can be what drops it
    val copyText = benchText + " tail0 tail1 tail2"
    val dupText = (0 until 12).map(t => s"d$t").mkString(" ")
    val junkText = Seq.fill(50)("x").mkString(" ") // ttr 1/50 -> low quality
    val keepText = (0 until 30).map(t => s"k$t").mkString(" ")
    withDocs(Seq(benchId -> benchText, copyId -> copyText,
      dupA -> dupText, dupB -> dupText,
      junkId -> junkText, keepId -> keepText)) { dir =>
      val kept = graft.operators.Curation.curate(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!kept.contains(copyId), "benchmark copy must be decontaminated away")
      assert(!kept.contains(dupB), "non-canonical duplicate must be dropped")
      assert(kept.contains(dupA), "duplicate-group canonical survives")
      assert(!kept.contains(junkId), "low-quality doc must be dropped")
      assert(kept.contains(keepId), "clean distinct doc survives")
    }
  }

  test("curateFrom over persisted stage outputs equals the self-contained funnel") {
    // the production shape: stages run once, outputs persisted, funnel
    // consumes the materialized frames — must be row-identical to
    // curate's recompute-everything form
    val stages = Seq(
      graft.operators.TextAnalysis.quality(spark, sfDir),
      graft.operators.Dedup.exact(spark, sfDir),
      graft.operators.Dedup.decontaminate(spark, sfDir)).map(_.persist())
    try {
      val direct = graft.operators.Curation.curate(spark, sfDir).collect().toSeq
      val staged = graft.operators.Curation.curateFrom(
        graft.sources.Tables.documents(spark, sfDir),
        stages(0), stages(1), stages(2)).collect().toSeq
      assert(staged == direct, "persisted-stage funnel diverged from curate")
      assert(direct.nonEmpty, "funnel kept nothing — comparison is vacuous")
    } finally stages.foreach(_.unpersist())
  }

  test("pipelinePackFrom over persisted stage outputs equals the self-contained funnel (J1)") {
    // the I-series composition contract: curate -> semantic drops ->
    // mix resample -> shard pack, with every stage materialized once —
    // must be row-identical to pipelinePack's recompute form
    val stages = Seq(
      graft.operators.Curation.curate(spark, sfDir),
      graft.operators.Pipeline.semanticDrops(spark, sfDir)).map(_.persist())
    try {
      val direct = graft.operators.Pipeline.pipelinePack(spark, sfDir)
        .collect().toSeq
      val staged = graft.operators.Pipeline.pipelinePackFrom(
        graft.sources.Tables.documents(spark, sfDir),
        stages(0), stages(1)).collect().toSeq
      assert(staged == direct, "persisted-stage pipeline diverged from pipelinePack")
      assert(direct.nonEmpty, "pipeline packed nothing — comparison is vacuous")
      // the funnel has bite at every stage on this fixture: fewer docs
      // than the corpus reach the packer, and shards actually fill
      val packedDocs = direct.map(_.getLong(1)).sum
      val corpus = graft.sources.Tables.documents(spark, sfDir).count()
      assert(packedDocs < corpus, "no stage filtered anything — funnel is vacuous")
      assert(packedDocs > 0)
    } finally stages.foreach(_.unpersist())
  }

  test("skip audit categorizes planted bad envelopes by reference reason order") {
    val dir = Files.createTempDirectory("graft_skip").toFile
    try {
      import spark.implicits._
      val t = 1705276800000000000L
      Seq(
        (1L, Option(t), Option("""{"k": 5}""")), // ok
        (2L, Option(t), None), // missing_detail
        (3L, Option(t), Option("""{"x": 1}""")), // bad_detail: no k
        (4L, Option(t), Option("""{"k": "abc"}""")), // bad_detail: k not int
        (5L, None, Option("""{"k": 5}"""))) // missing_time (checked FIRST)
        .map { case (id, ts, props) => (id, ts, 7L, "r", 1.0, props) }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      val got = graft.operators.EventLogOps.skipAudit(spark, dir.getPath)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("ok" -> 1L, "missing_detail" -> 1L,
        "bad_detail" -> 2L, "missing_time" -> 1L), s"got $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("raw JSON-envelope ingest: reference skip rules, batch and streaming agree") {
    val dir = Files.createTempDirectory("graft_env").toFile
    try {
      val lines = Seq(
        """{"time": "2024-01-15T00:00:00Z", "detail": {"k": 1}}""", // ok
        """{"time": "2024-01-15T00:00:01.500+02:00", "detail": 7}""", // ok: offset+fraction
        """not json at all""", // skip: unparseable
        """{"detail": {"k": 2}}""", // skip: missing time
        """{"time": 5, "detail": {"k": 3}}""", // skip: non-string time
        """{"time": "not-a-time", "detail": {"k": 4}}""", // skip: bad RFC3339
        // lenient-but-non-RFC3339 shapes Spark's default parser would
        // ACCEPT (in session TZ) but Go's time.RFC3339 rejects — the
        // regex gate must skip them
        """{"time": "2024-01-15 00:00:03", "detail": {"k": 5}}""", // no 'T'/offset
        """{"time": "2024-01-15", "detail": {"k": 6}}""", // date-only
        """{"time": "2024-01-15T00:00:04", "detail": {"k": 7}}""", // no offset
        """{"time": "2024-01-15T00:00:05Z\n", "detail": {"k": 8}}""", // trailing newline
        // explicit JSON-null detail: the reference INGESTS it (map
        // lookup ok=true, json.Marshal(nil) -> "null")
        """{"time": "2024-01-15T00:00:06Z", "detail": null}""",
        """{"time": "2024-01-15T00:00:02Z"}""") // skip: missing detail
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/envelopes.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))

      val batch = graft.operators.EventLogOps
        .parseEnvelopes(spark.read.text(dir.getPath))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // 2024-01-15T00:00:00Z = 1705276800s; +02:00 offset line is
      // 2024-01-14T22:00:01.5Z
      assert(batch.map(_._1) ==
        Set(1705276800000000L, 1705269601500000L, 1705276806000000L),
        s"batch envelope parse: $batch")
      assert(batch.map(_._2) == Set("""{"k":1}""", "7", "null"),
        s"detail payloads: $batch")

      // streaming: same transform over readStream.text
      val name = "env_" + System.nanoTime()
      val q = graft.operators.EventLogOps
        .parseEnvelopes(spark.readStream.text(dir.getPath))
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = spark.table(name)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == batch, "streaming and batch envelope parse diverge")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("mix resample downsamples over-represented sources toward the uniform share") {
    // 3 sources: 60 / 30 / 10 docs over 100 total, uniform target 33.3
    val docs = (0 until 60).map(i => (i.toLong, s"t$i word salad")) ++
      (60 until 90).map(i => (i.toLong, s"u$i word salad")) ++
      (90 until 100).map(i => (i.toLong, s"v$i word salad"))
    val dir = Files.createTempDirectory("graft_mix").toFile
    try {
      import spark.implicits._
      docs.map { case (id, t) =>
        val src = if (id < 60) "big" else if (id < 90) "mid" else "small"
        (id, t, "en", src, t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      val kept = Sampling.mixResample(spark, dir.getPath)
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // 'small' (10 < 33.3 target) passes through entirely; 'big' must
      // shed docs (rate 33.3/60 = 0.56); hash noise allows slack
      assert(kept("small") == 10, s"under-target source must keep all: $kept")
      assert(kept("big") < 60 && kept("big") > 10, s"over-target must downsample: $kept")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("token budget keeps a hash-ordered prefix per source, never exceeding the budget") {
    val out = Sampling.tokenBudget(spark, sfDir, budget = 500L)
    val bySource = out.collect().groupBy(_.getString(1))
    assert(bySource.nonEmpty)
    for ((_, rows) <- bySource) {
      assert(rows.map(_.getLong(3)).max <= 500L, "budget exceeded")
      // cum really is the running sum of the kept rows' est_tokens
      assert(rows.map(_.getLong(2)).sum == rows.map(_.getLong(3)).max,
        "kept rows must be the exact running-sum prefix")
    }
    // and something was actually cut (sf data has more than 500
    // tokens per source)
    val total = graft.sources.Tables.documents(spark, sfDir).count()
    assert(out.count() < total, "budget did not bind on the fixture data")
  }

  test("token budget two-level prefix sum matches the single-window form on a skewed corpus") {
    // the 100 TB shape: one dominant source (~95% of docs). The
    // two-level form must (a) produce EXACTLY the single-window
    // result and (b) sort only the pruned head buckets, not the
    // whole dominant source.
    val dir = java.nio.file.Files.createTempDirectory("graft_tb").toFile
    try {
      import spark.implicits._
      val docs = (0 until 4000).map { i =>
        val src = if (i % 20 == 0) "small" else "big"
        val text = "x" * (i % 37 + 1)
        (i.toLong, text, "en", src, text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      docs.coalesce(2).write.parquet(s"$dir/documents.parquet")
      val budget = 300L
      val got = Sampling.tokenBudget(spark, dir.getPath, budget = budget)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // driver-side single-window reference: per source, order by
      // (md5(doc_id || ":budget"), doc_id), prefix-sum, cut at budget
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      val want = (0 until 4000).map { i =>
        val src = if (i % 20 == 0) "small" else "big"
        val est = math.ceil((i % 37 + 1) / 4.0).toLong
        (i.toLong, src, est, md5hex(s"$i:budget"))
      }.groupBy(_._2).flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy(r => (r._4, r._1)).flatMap { case (id, src, est, _) =>
          cum += est
          // est >= 0 makes cum monotone, so this per-row filter IS the prefix cut
          if (cum <= budget) Some((id, src, est, cum)) else None
        }
      }.toSeq.sortBy(_._1)
      assert(got.toSeq == want, s"two-level output diverged from single-window reference")
      // pruning evidence: the final window sorts only surviving-bucket
      // rows — a small fraction of the dominant source, not all of it
      val cand = Sampling.tokenBudgetCandidates(spark, dir.getPath, budget, "budget")
      val candBig = cand.where(col("source") === "big").count()
      val totalBig = 3800L
      assert(candBig < totalBig / 4,
        s"pruning did not bound the window input: $candBig of $totalBig dominant-source rows survived")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("approx profile tracks exact distinct counts and quantiles") {
    val approx = Sampling.approxProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = graft.sources.Tables.eventsRaw(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.4)").as("p40"),
        expr("percentile(value, 0.6)").as("p60"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for ((k, a) <- approx) {
      val e = exact(k)
      val exactU = e.getLong(1).toDouble
      assert(math.abs(a.getLong(2) - exactU) / exactU <= 0.05,
        s"$k: approx distinct ${a.getLong(2)} vs exact $exactU")
      // p50 estimate must land within the exact p40..p60 value band
      assert(a.getDouble(3) >= e.getDouble(3) && a.getDouble(3) <= e.getDouble(4),
        s"$k: approx p50 ${a.getDouble(3)} outside [${e.getDouble(3)}, ${e.getDouble(4)}]")
    }
  }
}
