package graft

import scala.io.Source

/** Exact-output pins for the rows-only queries. The AnnRecallSpec
  * recall gate (≥0.9) can mask a silent drift from 1.0 to 0.9; these
  * goldens can't — any change to the trained output (sampling, seeding,
  * iteration count, tie-breaks, ADC math, shortlist size) fails here
  * until [[GoldenGen]] is deliberately re-run and the diff reviewed.
  * Pinned on sf0.001 (the suite's fixture dir) — the training paths
  * are deterministic by construction: md5 sample order, fixed iters,
  * smallest-id ties.
  *
  * H7's quantile columns get a 1% relative band instead of equality:
  * percentile_approx merges partial GK sketches in shuffle-fetch order,
  * which Spark does not promise to be stable; everything else in the
  * profile (exact counts, HLL distinct — an order-insensitive register
  * max) is pinned exactly.
  */
class GoldenSpec extends SparkSpec {

  private def golden(name: String): Seq[String] = {
    val src = Source.fromFile(s"${GoldenGen.Dir}/$name.csv")
    try src.getLines().toVector finally src.close()
  }

  for (name <- Seq("q_ann_ivf_trained", "q_ann_pq", "q_ann_ivfpq"))
    test(s"$name output equals the checked-in golden (exact ids, 6-dp scores)") {
      val got = GoldenGen.annCsv(SparkEntry.queries(name)(spark, sfDir))
      val want = golden(name)
      assert(got == want,
        s"$name drifted from golden — first diff: ${
          got.zipAll(want, "<missing>", "<extra>")
            .find { case (a, b) => a != b }.getOrElse(("", ""))
        }; if the change is intentional, re-run GoldenGen and review the diff")
    }

  test("q_dedup_semantic output equals the checked-in golden (cluster, 6-dp cent_sim, verdict)") {
    val got = GoldenGen.semCsv(SparkEntry.queries("q_dedup_semantic")(spark, sfDir))
    val want = golden("q_dedup_semantic")
    assert(got == want,
      s"q_dedup_semantic drifted from golden — first diff: ${
        got.zipAll(want, "<missing>", "<extra>")
          .find { case (a, b) => a != b }.getOrElse(("", ""))
      }; if the change is intentional, re-run GoldenGen and review the diff")
  }

  test("q_dedup_semantic_incremental output equals the checked-in golden (I6)") {
    val got = GoldenGen.semIncCsv(
      graft.operators.SemanticDedup.semanticDedupIncremental(spark, sfDir))
    val want = golden("q_dedup_semantic_incremental")
    assert(got == want,
      s"q_dedup_semantic_incremental drifted from golden — first diff: ${
        got.zipAll(want, "<missing>", "<extra>")
          .find { case (a, b) => a != b }.getOrElse(("", ""))
      }; if intentional, re-run GoldenGen and review")
  }

  test("streaming semantic emission set equals the checked-in golden (I7, real stream replay)") {
    // GoldenGen pinned via the BATCH twin (matchesOfBatch); replaying
    // the REAL stream against the same file cross-pins the two paths
    val root = java.nio.file.Files.createTempDirectory("graft_sgold").toFile
    try {
      val streamDir = s"$root/stream"
      new java.io.File(streamDir).mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${GoldenGen.VerifyDir}/embeddings.parquet"),
        java.nio.file.Paths.get(s"$streamDir/part-0.parquet"))
      val cents = graft.streaming.VecStreams
        .corpusCentroids(spark, GoldenGen.SfDir, GoldenGen.StreamK)
      val kept = graft.streaming.VecStreams
        .keptIndex(spark, GoldenGen.SfDir, cents, GoldenGen.StreamTau)
      val name = "sgold_" + System.nanoTime()
      val q = graft.streaming.VecStreams
        .semanticMatches(spark, streamDir, cents, kept, GoldenGen.StreamTau)
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = GoldenGen.semStreamCsv(spark.table(name))
      val want = golden("semantic_stream_matches")
      assert(got == want,
        s"I7 stream emissions drifted from golden — first diff: ${
          got.zipAll(want, "<missing>", "<extra>")
            .find { case (a, b) => a != b }.getOrElse(("", ""))
        }; if intentional, re-run GoldenGen and review")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(root)
    }
  }

  test("live sf0.01 semantic drop-set still equals the checked-in golden (drift gate)") {
    // the q_pipeline_pack/q_drop_ledger oracles now embed the RUN's
    // own drop list (valid at every SF); this golden remains as the
    // drift gate — the trained stage cannot silently move at the
    // reviewed fixture without failing here first
    val live = graft.operators.SemanticDedup
      .semanticDedup(spark, GoldenGen.VerifyDir)
      .where(!org.apache.spark.sql.functions.col("keep"))
      .select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(graft.operators.Pipeline.goldenDropIdsSf001 == live,
      "semantic_drop_sf0.01.csv is stale — re-run GoldenGen and review")
  }

  test("q_profile_approx matches golden (exact counts/HLL, 1% band on quantiles)") {
    // the RAW estimate form (the gated q_profile_approx is the audit
    // since round 16; this golden pins the sketch values themselves)
    val got = GoldenGen.profileCsv(
      graft.operators.Sampling.approxProfile(spark, sfDir))
    val want = golden("q_profile_approx")
    assert(got.size == want.size, s"row count drifted: ${got.size} vs ${want.size}")
    got.zip(want).foreach { case (g, w) =>
      val (gc, wc) = (g.split(","), w.split(","))
      assert(gc.take(3).sameElements(wc.take(3)),
        s"route/count/HLL drifted from golden: $g vs $w")
      for (i <- 3 to 4) {
        val (gv, wv) = (gc(i).toDouble, wc(i).toDouble)
        assert(math.abs(gv - wv) <= 0.01 * math.abs(wv) + 1e-9,
          s"quantile column $i outside 1% band: $g vs $w")
      }
    }
  }
}
