package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{RuleFilters, Selection, SimilaritySearch}

/** Z-series behavior: Z4's FineWeb filters discriminate the planted
  * failure modes the paper targets, Z2's histogram-midrank percentile
  * is a true per-source rank transform (monotone, comparable keep
  * fractions across differently-scaled sources), and Z3's quota sample
  * equals the window-rank reference while never exceeding the cap. */
class ZSeriesSpec extends SparkSpec {

  import spark.implicits._

  // ---------------------------------------------------------------- Z4
  test("fineweb filters: each planted failure mode trips exactly its rule") {
    val goodLines = (1 to 12).map(i =>
      s"this is a well formed prose line number $i with enough characters to pass.")
    val good = goodLines.mkString("\n")
    // no line ends in terminal punctuation
    val noPunct = goodLines.map(_.stripSuffix(".")).mkString("\n")
    // one long line duplicated so dup chars dominate
    val dupLines = (Seq.fill(6)(goodLines.head) ++ goodLines.take(3)).mkString("\n")
    // mostly sub-30-char lines
    val shorty = (Seq.fill(9)("tiny line.") ++ goodLines.take(3)).mkString("\n")
    val docs = Seq(
      (1L, good, "s"), (2L, noPunct, "s"), (3L, dupLines, "s"), (4L, shorty, "s"))
      .toDF("doc_id", "text", "source")
    val out = RuleFilters.fineWebFiltersFrom(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("ok_punct"), r.getAs[Boolean]("ok_dup"),
          r.getAs[Boolean]("ok_short"), r.getAs[Boolean]("pass"))).toMap
    assert(out(1L) == ((true, true, true, true)), s"good doc: ${out(1L)}")
    assert(!out(2L)._1 && !out(2L)._4, s"punct-free doc escaped: ${out(2L)}")
    assert(out(2L)._2 && out(2L)._3, s"punct-free doc tripped other rules: ${out(2L)}")
    assert(!out(3L)._2 && !out(3L)._4, s"dup-line doc escaped: ${out(3L)}")
    assert(!out(4L)._3 && !out(4L)._4, s"short-line doc escaped: ${out(4L)}")
  }

  test("fineweb verdict agrees with its statistic on a newlines-only doc") {
    // tot_chars=0 (text of only newlines): dup_frac reports 0.0, which
    // is below the 0.10 bar, so ok_dup must be true — the verdict and
    // the statistic it summarizes may never contradict each other
    val docs = Seq((1L, "\n\n\n", "s")).toDF("doc_id", "text", "source")
    val r = RuleFilters.fineWebFiltersFrom(docs).collect().head
    assert(r.getAs[Long]("tot_chars") == 0L, r.toString)
    assert(r.getAs[Double]("dup_frac") == 0.0, r.toString)
    assert(r.getAs[Boolean]("ok_dup"), s"ok_dup contradicts dup_frac=0.0: $r")
  }

  test("fineweb dup-line fraction counts chars in occurrences after the first") {
    // "aaaa" ×3 + "bb" ×1: dup chars = 2·4 = 8 of 4·3+2 = 14 line chars
    val docs = Seq((1L, "aaaa\nbb\naaaa\naaaa", "s")).toDF("doc_id", "text", "source")
    val r = RuleFilters.fineWebFiltersFrom(docs).collect().head
    assert(r.getAs[Long]("dup_chars") == 8L, r.toString)
    assert(r.getAs[Long]("tot_chars") == 14L, r.toString)
    assert(r.getAs[Long]("n_lines") == 4L, r.toString)
  }

  // ---------------------------------------------------------------- Z2
  test("qnorm percentile is a monotone per-source rank transform in (0,1)") {
    val out = Selection.qualityQnorm(spark, sfDir)
      .select("source", "bin", "pct_norm").distinct().collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val p = r.getAs[Double]("pct_norm")
      assert(p > 0.0 && p < 1.0, s"percentile out of range: $r")
    }
    // within a source, a higher bin must read a >= percentile
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("bin"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("pct_norm") <= b.getAs[Double]("pct_norm"),
            s"non-monotone percentile: $a -> $b")
        case _ =>
      }
    }
  }

  test("qnorm makes one global cut comparable across shifted sources") {
    // source A scores cluster LOW (short texts), source B HIGH (long
    // varied texts): a raw global threshold keeps wildly different
    // fractions; the rank transform keeps ~20% of EACH source
    val rnd = new scala.util.Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def textOf(n: Int): String =
      (0 until n).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val docs = ((0L until 400L).map(i => (i, textOf(5 + rnd.nextInt(10)), "low")) ++
      (400L until 800L).map(i => (i, textOf(60 + rnd.nextInt(60)), "high")))
      .toDF("doc_id", "text", "source")
    val kept = Selection.qualityQnormFrom(docs)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("keep_top"), 1L).otherwise(0L)).as("k"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("k").toDouble / r.getAs[Long]("n"))).toMap
    // keep fraction per source within bin-resolution slack of 20%
    kept.foreach { case (s, f) =>
      assert(f > 0.10 && f < 0.30, s"source $s keep fraction $f not ~20%")
    }
  }

  // ---------------------------------------------------------------- Z6
  test("streaming qnorm gate equals the batch percentile row-for-row") {
    // the scorer is one stateless stream-static join against the
    // frozen percentile table, so streaming the whole corpus through
    // it must reproduce the batch output exactly
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val table = Selection.qnormTableFrom(docs)
    val batch = Selection.qualityQnormFrom(docs)
    val tmp = java.nio.file.Files.createTempDirectory("graft_qnorm").toString
    try {
      docs.write.parquet(s"$tmp/docs")
      val q = Selection.qnormScore(
          graft.streaming.DocStreams.readDocs(spark, s"$tmp/docs"), table)
        .writeStream.format("memory").queryName("z6_qnorm")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("z6_qnorm")
      assert(got.count() == batch.count())
      assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
        "stream and batch qnorm percentiles diverge")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("qnorm scorer surfaces docs unseen by a stale table instead of dropping them") {
    // Z6 serves against a FROZEN percentile table; a doc from a new
    // source (or a bin the frozen batch never populated) must ride
    // through flagged — pct_norm NULL, n_src 0, keep_top false — not
    // silently vanish from the scored stream
    val frozen = Selection.qnormTableFrom(
      Seq((1L, "a solid prose line.", "known")).toDF("doc_id", "text", "source"))
    val arriving = Seq(
      (10L, "a solid prose line.", "known"),       // matches the table
      (11L, "a solid prose line.", "new_source"))  // source absent from it
      .toDF("doc_id", "text", "source")
    val out = Selection.qnormScore(arriving, frozen).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 2, s"unseen doc dropped: ${out.keys}")
    val unseen = out(11L)
    assert(unseen.isNullAt(unseen.fieldIndex("pct_norm")),
      s"unseen doc should flag a null percentile: $unseen")
    assert(unseen.getAs[Long]("n_src") == 0L, unseen.toString)
    assert(!unseen.getAs[Boolean]("keep_top"), unseen.toString)
    assert(!out(10L).isNullAt(out(10L).fieldIndex("pct_norm")),
      s"matched doc must still score: ${out(10L)}")
  }

  // ---------------------------------------------------------------- Z3
  test("cluster-cap sample: never over cap, and equals the window-rank reference") {
    val out = SimilaritySearch.clusterCapSample(spark, sfDir).cache()
    try {
      val sizes = out.groupBy("cid").count().collect()
      assert(sizes.nonEmpty)
      sizes.foreach(r => assert(r.getAs[Long]("count") <=
        SimilaritySearch.ClusterCap, s"cluster over quota: $r"))
      // reference: same assignment (via V3's frozen-model machinery,
      // same cached model for this dir), full window row_number quota
      val assigned = SimilaritySearch.protoPrune(spark, sfDir)
        .select(col("vec_id"), col("cid"),
          graft.operators.Sampling.hashBucket(col("vec_id"), "ccap").as("hrank"))
      val w = Window.partitionBy("cid").orderBy(col("hrank"), col("vec_id"))
      val ref = assigned.withColumn("rk", row_number().over(w))
        .where(col("rk") <= SimilaritySearch.ClusterCap)
        .select("cid", "vec_id", "hrank")
      assert(out.exceptAll(ref).isEmpty && ref.exceptAll(out).isEmpty,
        "TopK quota diverged from the window-rank reference")
    } finally out.unpersist()
  }
}
