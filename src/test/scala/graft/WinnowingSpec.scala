package graft

import org.apache.spark.sql.functions._

import graft.operators.Winnowing

/** Pins the two published winnowing guarantees (Schleimer et al. 2003)
  * on planted fixtures, plus the no-false-positive floor. */
class WinnowingSpec extends SparkSpec {

  import spark.implicits._

  private def fps(docs: Seq[(Long, String)]) =
    Winnowing.fingerprintsFrom(spark, docs.toDF("doc_id", "text"))

  test("guarantee: a shared run of >= W+K-1 tokens always yields a shared fingerprint") {
    // the shared run is exactly GuaranteeTokens long and sits inside
    // otherwise-disjoint token streams; try several embeddings so the
    // window phase can't accidentally align
    val run = (1 to Winnowing.GuaranteeTokens).map(i => s"shared$i").mkString(" ")
    for (pad <- 0 to 4) {
      val a = ((1 to 9).map(i => s"alpha$i") :+ run).mkString(" ")
      val b = (((1 to (9 + pad)).map(i => s"beta$i") :+ run) ++
        (1 to 5).map(i => s"gamma$i")).mkString(" ")
      val shared = Winnowing.winnowPairsFrom(
        spark, Seq((1L, a), (2L, b)).toDF("doc_id", "text")).collect()
      assert(shared.length == 1 && shared.head.getAs[Long]("n_shared_fp") >= 1,
        s"guarantee broken at pad=$pad: no shared fingerprint for a " +
          s"${Winnowing.GuaranteeTokens}-token shared run")
    }
  }

  test("no shared K-gram -> no shared fingerprint (no false positives)") {
    val a = (1 to 20).map(i => s"left$i").mkString(" ")
    val b = (1 to 20).map(i => s"right$i").mkString(" ")
    val pairs = Winnowing.winnowPairsFrom(
      spark, Seq((1L, a), (2L, b)).toDF("doc_id", "text")).count()
    assert(pairs == 0)
  }

  test("density: fingerprints per doc are bounded by the windows and floored by W") {
    val text = (1 to 60).map(i => s"tok$i").mkString(" ")
    val n = fps(Seq((1L, text))).count()
    val grams = 60 - Winnowing.K + 1
    val windows = grams - Winnowing.W + 1
    assert(n <= windows, s"more fingerprints ($n) than windows ($windows)")
    // a selection survives at most W consecutive windows
    assert(n >= windows / Winnowing.W,
      s"fewer fingerprints ($n) than the 1-per-W floor (${windows / Winnowing.W})")
  }

  test("bucket cap bounds a planted boilerplate fingerprint's pair output") {
    // a template run shared by 8 docs is the hot-LSH-band shape: the
    // uncapped join would emit C(8,2)=28 pairs out of its buckets; the
    // cap must bound it to the C(cap,2) pairs among the SMALLEST doc
    // ids (deterministic sorted slice), while a real near-dup family
    // below the cap still pairs
    val boiler = (1 to Winnowing.GuaranteeTokens + 4)
      .map(i => s"template$i").mkString(" ")
    val family = (1 to Winnowing.GuaranteeTokens + 4)
      .map(i => s"family$i").mkString(" ")
    val docs = ((10L to 17L).map(id =>
      (id, (1 to 8).map(i => s"pad${id}x$i").mkString(" ") + " " + boiler)) ++
      Seq((100L, "intro words here. " + family),
        (101L, family + " trailing words here.")))
      .toDF("doc_id", "text")
    val uncapped = Winnowing.winnowPairsFrom(spark, docs).collect()
    assert(uncapped.count(r => r.getAs[Long]("doc_a") < 100L) == 28,
      "fixture broken: boilerplate family should emit 28 uncapped pairs")
    val capped = Winnowing.winnowPairsFrom(spark, docs, cap = 3).collect()
    val boilerPairs = capped.filter(_.getAs[Long]("doc_a") < 100L)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(boilerPairs == Set((10L, 11L), (10L, 12L), (11L, 12L)),
      s"cap must keep exactly the pairs among the 3 smallest ids: $boilerPairs")
    val fam = capped.filter(_.getAs[Long]("doc_a") === 100L)
    assert(fam.length == 1 && fam.head.getAs[Long]("doc_b") == 101L &&
      fam.head.getAs[Long]("n_shared_fp") >= 1,
      "planted near-dup family must still pair under the cap")
  }

  test("incremental: an old-copy doc reads shared_frac 1, a fresh doc 0") {
    // ids on each side of the batch split
    val pool = (0L until 4000L).toDF("doc_id")
      .withColumn("nw", graft.operators.Sampling.hashBucket(
        col("doc_id"), "winbatch") <
        graft.operators.Sampling.pctThreshold(20))
    val oldId = pool.where(!col("nw")).select("doc_id").as[Long].head(1).head
    val newIds = pool.where(col("nw")).select("doc_id").as[Long].head(2)
    val oldText = (1 to 30).map(i => s"corpus$i").mkString(" ")
    val fresh = (1 to 30).map(i => s"fresh$i").mkString(" ")
    val out = Winnowing.winnowIncrementalFrom(spark,
      Seq((oldId, oldText)).toDF("doc_id", "text"),
      Seq((newIds(0), oldText), (newIds(1), fresh)).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(newIds(0)).getAs[Double]("shared_frac") == 1.0)
    assert(out(newIds(1)).getAs[Double]("shared_frac") == 0.0)
  }

  test("incremental over a persisted fp index equals the self-contained form") {
    import graft.sources.Tables
    import graft.operators.Winnowing.isWinNew
    val docs = Tables.documents(spark, sfDir)
    val self = Winnowing.winnowIncremental(spark, sfDir).collect()
    val dir = java.nio.file.Files.createTempDirectory("graft_fpidx").toFile
    try {
      Winnowing.fpValuesFrom(spark, docs.where(!isWinNew(col("doc_id"))))
        .select("fp").distinct()
        .write.mode("overwrite").parquet(dir.getPath)
      val from = Winnowing.winnowIncrementalWith(spark,
        docs.where(isWinNew(col("doc_id"))),
        spark.read.parquet(dir.getPath)).collect()
      assert(self.toSeq == from.toSeq,
        "steady-state probe diverged from the self-contained form")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("streaming winnow gate emits exactly the batch incremental collision mass") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.Tables
    import graft.operators.Winnowing.isWinNew
    val tmp = java.nio.file.Files.createTempDirectory("graft_wins").toString
    try {
      val docs = Tables.documents(spark, sfDir)
      docs.where(isWinNew(col("doc_id"))).write.parquet(s"$tmp/new")
      val idx = graft.streaming.DocStreams.corpusFpIndex(spark, sfDir)
        .localCheckpoint()
      val name = "wingate_" + System.nanoTime()
      val q = graft.streaming.DocStreams
        .winnowMatches(spark, s"$tmp/new", idx)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = spark.table(name)
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Winnowing.winnowIncremental(spark, sfDir)
        .where(col("n_shared") > 0)
        .select("doc_id", "n_shared")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch,
        s"stream diverged from batch: ${(streamed diff batch).size}+${(batch diff streamed).size} rows")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("native winnow kernel matches the spelled-out HOF chain bit-for-bit") {
    // the DuckDB twin mirrors the portable chain term for term, so
    // native == portable pins the oracle equivalence — incl. the
    // rightmost-tie path (runs of IDENTICAL tokens make equal gram
    // digests inside one window), multi-space runs (empty tokens),
    // short-text (< K tokens), empty and NULL degenerates
    import spark.implicits._
    val tie = (1 to 20).map(_ => "same").mkString(" ")
    val texts = Seq(
      (1 to 40).map(i => s"tok$i").mkString(" "),
      tie,
      s"prefix $tie suffix1 suffix2",
      "a  b   c", // empty tokens between runs of spaces
      "one two", // fewer than K tokens
      "solo", "", null,
      ((1 to 9).map(i => s"alpha$i") ++ (1 to 9).map(i => s"alpha$i"))
        .mkString(" ")) // an internal repeat: window re-selection path
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val nat = Winnowing.fingerprintsFrom(spark, df)
    val port = df.select(col("doc_id"),
        explode(Winnowing.fpStructsPortable(spark, col("text"))).as("f"))
      .select(col("doc_id"), col("f.pos").as("pos"), col("f.fp").as("fp"))
    assert(nat.collect().map(_.toSeq).sortBy(_.toString)
      .sameElements(port.collect().map(_.toSeq).sortBy(_.toString)))
    assert(nat.count() > 0)
  }

  test("maintained fp index equals the intact full rebuild (poison-proof)") {
    // the O5/L4/K8 discipline: one CDC delta (removed / changed /
    // added) against a standing index, with every NON-delta doc's
    // text corrupted in the frame handed to maintenance — if
    // maintenance reads ANY unchanged doc's text, the poison leaks
    // into its fingerprints and the equality below breaks
    def tokens(seed: String) =
      (1 to Winnowing.GuaranteeTokens + 6).map(i => s"$seed$i").mkString(" ")
    val v0 = Seq(
      (1L, tokens("alpha")), (2L, tokens("beta")),
      (3L, tokens("gamma")), (4L, tokens("delta")))
      .toDF("doc_id", "text")
    val index0 = Winnowing.fpValuesFrom(spark, v0).localCheckpoint()
    // v1: doc 2 removed, doc 3 changed, doc 5 added, docs 1/4 untouched
    val v1 = Seq(
      (1L, tokens("alpha")), (3L, tokens("gammaNew")),
      (4L, tokens("delta")), (5L, tokens("epsilon")))
      .toDF("doc_id", "text")
    val delta = Seq((2L, "removed"), (3L, "changed"), (5L, "added"))
      .toDF("doc_id", "change")
    val poisoned = v1.withColumn("text",
      when(col("doc_id").isin(3L, 5L), col("text"))
        .otherwise(lit("POISON unread text")))
    val maintained = Winnowing
      .maintainFpIndex(spark, index0, poisoned, delta)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val rebuilt = Winnowing.fpValuesFrom(spark, v1)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(maintained.sameElements(rebuilt),
      s"maintained index diverged from the intact rebuild")
    assert(maintained.nonEmpty && !maintained.exists(_._1 == 2L))
  }

  test("rightmost-minimum tie rule: identical hashes in one window pick the later position") {
    // a run of IDENTICAL tokens makes every gram (and hash) in the
    // window equal — the selected pos must be the window's last slot
    val text = (1 to 10).map(_ => "same").mkString(" ")
    val rows = fps(Seq((1L, text))).orderBy("pos").collect()
    // all grams identical -> one fp value; rightmost rule re-selects a
    // NEW (later) position each time the window slides past the last
    // selection, so positions are W apart starting at slot W
    val positions = rows.map(_.getAs[Long]("pos")).toSeq
    assert(rows.map(_.getAs[String]("fp")).distinct.length == 1)
    assert(positions.head == Winnowing.W,
      s"first selection not at the window's rightmost slot: $positions")
  }
}
