package graft

import org.apache.spark.sql.functions._

import graft.operators.PsiDrift

/** Pins Y4's PSI semantics: identically-distributed populations read
  * ~0 (stable), a planted score shift crosses the published 0.25 bar,
  * the index is symmetric-positive, and a hand-computed two-bin case
  * matches to the bit. */
class PsiDriftSpec extends SparkSpec {

  import spark.implicits._

  test("psi on the fixture corpus: every source scores; tiny populations read low_n") {
    val out = PsiDrift.psiDrift(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val psi = r.getAs[Double]("psi")
      assert(psi >= 0.0, s"PSI must be non-negative, got $psi for $r")
      assert(Seq("stable", "drifting", "shifted", "low_n")
        .contains(r.getAs[String]("verdict")))
      // the small-sample guard: a sub-MinN side must never alarm
      if (r.getAs[Long]("n_ref") < PsiDrift.MinN ||
          r.getAs[Long]("n_cur") < PsiDrift.MinN)
        assert(r.getAs[String]("verdict") == "low_n",
          s"tiny population escaped the low_n guard: $r")
    }
  }

  test("an i.i.d. split at adequate n reads stable") {
    // 2000 docs, two prose texts alternating by id parity — parity is
    // uncorrelated with the salted batch hash, so both sides draw the
    // same two-bin mixture; with n_cur ≈ 400 the sampling-noise PSI
    // floor is ~0.003, far under the 0.1 bar
    val proseA = "the quick brown fox jumps over the lazy dog and runs away"
    val proseB = "a calm morning by the quiet sea with soft light and warm sand"
    val docs = (0L until 2000L)
      .map(i => (i, if (i % 2 == 0) proseA else proseB, "s"))
      .toDF("doc_id", "text", "source")
    val r = PsiDrift.psiDriftFrom(docs).collect().head
    assert(r.getAs[Long]("n_cur") >= PsiDrift.MinN)
    assert(r.getAs[String]("verdict") == "stable",
      s"i.i.d. split at adequate n must read stable: $r")
  }

  test("Y7: streaming micro-batch PSI equals the batch monitor bit-for-bit") {
    // the batch form's populations: cur = the 20% salted hash batch,
    // ref = the rest; stream exactly the cur docs against ref counts
    // and the emitted rows must equal psiDriftFrom(all docs)
    import graft.operators.Sampling
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val isCur = Sampling.hashBucket(col("doc_id"), "psibatch") <
      Sampling.pctThreshold(20)
    val refCounts = PsiDrift.bandCounts(docs.where(!isCur))
    val expected = PsiDrift.psiDriftFrom(docs)
    val tmp = java.nio.file.Files.createTempDirectory("graft_psi").toString
    try {
      docs.where(isCur).coalesce(1).write.parquet(s"$tmp/cur")
      val got = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      val q = graft.streaming.DocStreams.readDocs(spark, s"$tmp/cur")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= PsiDrift.psiMicroBatch(b, refCounts).collect() }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val exp = expected.collect()
      assert(got.nonEmpty && got.toSet == exp.toSet,
        s"stream PSI ${got.toSeq} != batch PSI ${exp.toSeq}")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("a planted score shift in the arriving batch crosses the 0.25 bar") {
    // find ids on each side of the batch split, then give the batch
    // side pathologically different text (gibberish-low quality)
    val pool = (0L until 2000L).toDF("doc_id")
      .withColumn("nw",
        graft.operators.Sampling.hashBucket(col("doc_id"), "psibatch") <
          graft.operators.Sampling.pctThreshold(20))
    val refIds = pool.where(!col("nw")).select("doc_id").as[Long].head(400)
    val curIds = pool.where(col("nw")).select("doc_id").as[Long].head(120)
    val prose = "the quick brown fox jumps over the lazy dog and runs away"
    val junk = "zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz"
    val docs = (refIds.map(i => (i, prose, "s1")) ++
      curIds.map(i => (i, junk, "s1"))).toSeq
      .toDF("doc_id", "text", "source")
    val r = PsiDrift.psiDriftFrom(docs).collect().head
    assert(r.getAs[String]("verdict") == "shifted",
      s"planted shift not detected: $r")
    assert(r.getAs[Double]("psi") > PsiDrift.ShiftBar)
  }

  test("two-bin hand computation matches to the bit") {
    // one source, scores land in exactly one bin per side; PSI
    // reduces to the closed form over smoothed proportions
    val pool = (0L until 2000L).toDF("doc_id")
      .withColumn("nw",
        graft.operators.Sampling.hashBucket(col("doc_id"), "psibatch") <
          graft.operators.Sampling.pctThreshold(20))
    import spark.implicits._
    val refIds = pool.where(!col("nw")).select("doc_id").as[Long].head(10)
    val curIds = pool.where(col("nw")).select("doc_id").as[Long].head(10)
    val prose = "the quick brown fox jumps over the lazy dog and runs away"
    val junk = "zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz"
    val docs = (refIds.map(i => (i, prose, "s")) ++
      curIds.map(i => (i, junk, "s"))).toSeq.toDF("doc_id", "text", "source")
    // bins actually hit, from the same scoring expression
    val bins = docs.select(
      least(floor(graft.operators.TextAnalysis.qualityScore(col("text")) *
        PsiDrift.PsiBins).cast("int"), lit(PsiDrift.PsiBins - 1)).as("b"),
      col("text") === junk)
      .distinct().collect()
      .map(r => r.getBoolean(1) -> r.getInt(0)).toMap
    val (bRef, bCur) = (bins(false), bins(true))
    assert(bRef != bCur, "fixture must separate the two texts' bins")
    def psiExpected: Double = {
      val B = PsiDrift.PsiBins
      def p(n: Long, total: Long) = (n + 1).toDouble / (total + B)
      // terms in ascending-bin order, left-assoc — the operator's
      // documented summation order
      (0 until B).map { b =>
        val pr = p(if (b == bRef) 10L else 0L, 10L)
        val pc = p(if (b == bCur) 10L else 0L, 10L)
        (pc - pr) * math.log(pc / pr)
      }.reduceLeft(_ + _)
    }
    val got = PsiDrift.psiDriftFrom(docs).collect().head.getAs[Double]("psi")
    val want = BigDecimal(psiExpected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == want, s"PSI $got != hand-computed $want")
  }
}
