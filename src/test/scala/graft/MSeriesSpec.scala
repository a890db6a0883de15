package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Boilerplate, Dedup, Reporting, TextAnalysis}
import graft.sources.Tables

/** M-series: pipeline observability (M1 report, M2 ledger) and the
  * stateless streaming boilerplate scrub (M3). */
class MSeriesSpec extends SparkSpec {

  // ------------------------------------------------------------- M1
  test("corpus report: one row per source, counts bounded and consistent") {
    val rep = Reporting.corpusReport(spark, sfDir).collect()
    val srcs = Tables.documents(spark, sfDir)
      .select(countDistinct("source")).collect()(0).getLong(0)
    assert(rep.length.toLong == srcs)
    val totalDocs = rep.map(_.getLong(1)).sum
    assert(totalDocs == Tables.documents(spark, sfDir).count())
    rep.foreach { r =>
      val n = r.getLong(1)
      Seq(2, 3, 4, 5).foreach { i =>
        assert(r.getLong(i) >= 0 && r.getLong(i) <= n,
          s"${r.getString(0)}: count col $i out of [0, $n]") }
      assert(r.getLong(6) > 0, "token mass positive")
      val tv = r.getDouble(7)
      assert(tv >= 0.0 && tv <= 1.0)
    }
    // the fixture plants exact dups and near dups somewhere
    assert(rep.map(_.getLong(3)).sum > 0, "some exact dups reported")
    assert(rep.map(_.getLong(4)).sum > 0, "some near dups reported")
  }

  // ------------------------------------------------------------- M2
  test("drop ledger: priority wins and every arm is represented honestly") {
    val ledger = Reporting.dropLedger(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ledger.nonEmpty)
    // exact-dup docs that are NOT contaminated must read exact_dup even
    // when they also fail quality
    val exactDups = Dedup.exact(spark, sfDir).where(col("is_dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = Dedup.decontaminate(spark, sfDir)
      .where(col("contaminated")).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    exactDups.diff(contaminated).foreach { id =>
      assert(ledger(id) == "exact_dup", s"doc $id: ${ledger(id)}") }
    contaminated.foreach { id =>
      assert(ledger(id) == "contaminated", s"doc $id: ${ledger(id)}") }
    // every low-quality doc appears with SOME reason
    val lowq = TextAnalysis.quality(spark, sfDir)
      .where(col("quality_score") < 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    lowq.foreach { id => assert(ledger.contains(id)) }
  }

  test("report and ledger over PERSISTED stage outputs equal the self-contained forms") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mfrom").toString
    try {
      // materialize each stage once, as a production pipeline would
      Seq(
        "quality" -> TextAnalysis.quality(spark, sfDir),
        "exact" -> Dedup.exact(spark, sfDir),
        "clusters" -> Dedup.dupClusters(spark, sfDir),
        "decon" -> Dedup.decontaminate(spark, sfDir),
        "drift" -> graft.operators.CorpusStats.sourceDrift(spark, sfDir),
        "semdrops" -> graft.operators.Pipeline.semanticDrops(spark, sfDir)
      ).foreach { case (n, df) => df.write.parquet(s"$tmp/$n") }
      def rd(n: String) = spark.read.parquet(s"$tmp/$n")
      val rep = Reporting.corpusReportFrom(
        Tables.documents(spark, sfDir), rd("quality"), rd("exact"),
        rd("clusters"), rd("decon"), rd("drift")).collect().toSeq
      val repLive = Reporting.corpusReport(spark, sfDir).collect().toSeq
      // the 7 leading columns are strings/integers — exact; tv_distance
      // is a float SUM whose add order legitimately moves when the
      // persisted frame comes back with different partitioning (last-
      // ULP wobble only; the oracle's own hash check covers the value)
      assert(rep.map(_.toSeq.init) == repLive.map(_.toSeq.init))
      rep.zip(repLive).foreach { case (a, b) =>
        assert(math.abs(a.getDouble(7) - b.getDouble(7)) < 1e-12) }
      val led = Reporting.dropLedgerFrom(rd("decon"), rd("exact"),
        rd("clusters"), rd("semdrops"), rd("quality")).collect().toSeq
      assert(led == Reporting.dropLedger(spark, sfDir).collect().toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  // ------------------------------------------------------------- M3
  test("streaming scrub equals the batch scrub row for row") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sscrub").toString
    try {
      Tables.documents(spark, sfDir).write.parquet(s"$tmp/docs")
      val hot = Boilerplate.collectHotSet(spark, sfDir)
      assert(hot.nonEmpty, "fixture corpus has hot tiles")
      val name = "sscrub_" + System.nanoTime()
      val q = Boilerplate.scrubStream(
        graft.streaming.DocStreams.readDocs(spark, s"$tmp/docs"), hot)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = Boilerplate.scrub(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want,
        s"stream diverged from batch on ${(got diff want).size} rows")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("streaming scrub with an empty hot set is the identity") {
    import spark.implicits._
    val out = Boilerplate.scrubStream(
      Seq((1L, "a b c d")).toDF("doc_id", "text"), Seq.empty)
      .collect()(0)
    assert(out.getString(1) == "a b c d" && out.getLong(3) == 0L)
  }
}
