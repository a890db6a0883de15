package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch probe main for interactive dev; not part of the contract.
  * Round-21 probe: per-JOB wall-clock breakdown of a query — names in
  * argv (default: the top sf0.1 offenders), each run once cold + once
  * warm with a listener recording every job's duration and call site,
  * so "where do the seconds go" is measured (scheduling overhead vs
  * stage compute, job counts of the iterative trainers) instead of
  * guessed. */
object Dev {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.operators.OracleContext.dir.set(dir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-job (start, end, callsite) log
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.headOption.map(_.name).getOrElse("?")
        jobs.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, t0, (System.nanoTime() - t0) / 1e9, site))
        }
      }
    })

    if (args.headOption.contains("qcstep")) { qcStepProbe(spark, dir); spark.stop(); return }
    if (args.headOption.contains("pq")) { pqProbe(spark, dir); spark.stop(); return }

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_quality_classifier", "q_qc_calibration", "q_drop_ledger",
      "q_profile_approx", "q_pipeline_pack", "q_ann_ivfpq", "q_corpus_report")
    for (name <- names; rep <- 1 to 2) {
      done.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val total = (System.nanoTime() - t0) / 1e9
      // drain: listener events are async; give them a beat
      Thread.sleep(300)
      val rows = {
        import scala.jdk.CollectionConverters._
        done.asScala.toSeq.sortBy(_._1)
      }
      val jobSum = rows.map(_._3).sum
      println(f"%n[dev] $name rep$rep total=$total%.3f s jobs=${rows.size} jobSum=$jobSum%.3f s (gap=${total - jobSum}%.3f)")
      var prevEnd = t0
      rows.foreach { case (id, js, d, site) =>
        val gapBefore = (js - prevEnd) / 1e9
        prevEnd = js + (d * 1e9).toLong
        println(f"[dev]   job$id%4d ${d}%8.3f s  gapBefore=$gapBefore%7.3f  $site")
      }
    }
    spark.stop()
  }

  /** Where do q_ann_pq's seconds go: codebook train (driver), encode
    * pass, full query. */
  private def pqProbe(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    def t[T](name: String, reps: Int = 3)(f: => T): T = {
      var r = f
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => r = f)
      println(f"[dev] $name: ${(System.nanoTime() - t0) / reps / 1e6}%.1f ms/rep")
      r
    }
    val model = t("trainPqCodebook") {
      graft.operators.SimilaritySearch.trainPqCodebook(emb)
    }
    graft.plans.GraftFunctions.register(spark)
    val codes = emb.select(col("vec_id"),
      call_function("graft_pq_encode", col("embedding"),
        lit(model.cb.toArray), lit(model.m), lit(model.k), lit(model.d)).as("code"))
    t("encode-noop") {
      codes.write.mode("overwrite").format("noop").save()
    }
    t("full-q_ann_pq") {
      SparkEntry.queries("q_ann_pq")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    // replicate the ADC score pipeline piecewise
    val m = model
    val qVecs = emb.where(col("vec_id") < 40).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val normLut = Array.tabulate(m.m * m.k) { idx =>
      var s = 0.0; var i = 0
      while (i < m.d) { val c = m.cb(idx * m.d + i).toDouble; s += c * c; i += 1 }
      s
    }
    val qRows = qVecs.map { case (id, v) =>
      val dotLut = Array.tabulate(m.m * m.k) { idx =>
        val mi = idx / m.k
        var s = 0.0; var i = 0
        while (i < m.d) { s += v(mi * m.d + i).toDouble * m.cb(idx * m.d + i).toDouble; i += 1 }
        s
      }
      (id, dotLut.toSeq, math.sqrt(v.map(x => x.toDouble * x.toDouble).sum))
    }.toSeq
    val qdf = spark.createDataFrame(qRows).toDF("query_id", "dot_lut", "q_norm")
    def lutSum(lut: org.apache.spark.sql.Column) =
      (0 until m.m).map(mi =>
        element_at(lut, lit(mi * m.k + 1) + element_at(col("code"), mi + 1)))
        .reduce(_ + _)
    val scored = codes.join(broadcast(qdf))
      .select(col("query_id"), col("vec_id"),
        (lutSum(col("dot_lut")) / (col("q_norm") * sqrt(lutSum(lit(normLut))))).as("s"))
    t("score-join-noop") {
      scored.write.mode("overwrite").format("noop").save()
    }
    t("score-topk-noop") {
      scored.groupBy("query_id")
        .agg(graft.functions.TopK.topk(spark, 50, col("vec_id"), col("s")).as("hits"))
        .write.mode("overwrite").format("noop").save()
    }
  }

  /** Microbench: what does one QC gradient step cost, and how much of
    * it is the per-query floor? Times 20 reps each of (a) a trivial
    * count over the same localCheckpoint, (b) explode+groupBy without
    * the margin fold, (c) the full gradient step shape. */
  private def qcStepProbe(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, dir)
    val feats = array_sort(array_distinct(concat(
      transform(split(col("text"), " "), w =>
        (graft.operators.Sampling.hashBucket(w, "qc") % 512).cast("int")),
      array(lit(512)))))
    val base = docs.select(feats.as("feats"), lit(1.0).as("y"))
      .limit(100000)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    println(s"[dev] base rows=${base.count()}")
    val w = Array.fill(513)(0.001)
    def t(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => f)
      println(f"[dev] $name: ${(System.nanoTime() - t0) / 20e6}%.1f ms/rep")
    }
    t("range-32-explain-formatted")(spark.range(0, 32, 1, 32).groupBy().count().collect())
    spark.conf.set("spark.sql.ui.explainMode", "simple")
    t("range-32-explain-simple")(spark.range(0, 32, 1, 32).groupBy().count().collect())
    spark.conf.set("spark.sql.ui.explainMode", "formatted")
    t("range-1part")(spark.range(0, 32, 1, 1).groupBy().count().collect())
    t("range-4part")(spark.range(0, 32, 1, 4).groupBy().count().collect())
    t("range-32part")(spark.range(0, 32, 1, 32).groupBy().count().collect())
    t("range-128part")(spark.range(0, 128, 1, 128).groupBy().count().collect())
    t("rdd-32part")(spark.sparkContext.parallelize(1 to 32, 32).count())
    t("rdd-1part")(spark.sparkContext.parallelize(1 to 32, 1).count())
    t("base-count")(base.count())
    t("count-only")(base.groupBy().count().collect())
    t("explode-groupBy-no-fold") {
      base.select(explode(col("feats")).as("i"), col("y").as("r"))
        .groupBy("i").agg(sum("r")).collect()
    }
    val margin = aggregate(col("feats"), lit(0.0), (acc, i) =>
      acc + element_at(lit(w), i + 1))
    t("full-step") {
      val resid = lit(1.0) / (lit(1.0) + exp(-margin)) - col("y")
      base.select(col("feats"), explode(array(resid)).as("r"))
        .select(explode(col("feats")).as("i"), col("r"))
        .groupBy("i").agg(sum("r")).collect()
    }
    t("full-step-noAQE") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val resid = lit(1.0) / (lit(1.0) + exp(-margin)) - col("y")
        base.select(col("feats"), explode(array(resid)).as("r"))
          .select(explode(col("feats")).as("i"), col("r"))
          .groupBy("i").agg(sum("r")).collect()
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    t("full-step-1part") {
      val resid = lit(1.0) / (lit(1.0) + exp(-margin)) - col("y")
      base.coalesce(8).select(col("feats"), explode(array(resid)).as("r"))
        .select(explode(col("feats")).as("i"), col("r"))
        .groupBy("i").agg(sum("r")).collect()
    }
  }
}
