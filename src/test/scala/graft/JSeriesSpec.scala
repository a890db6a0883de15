package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, Compaction, Dedup, Sampling}
import graft.sources.{SkipIndex, Tables}

/** J4-J8 behavior + plan contracts: log compaction, holdout split,
  * bloom-pruned join, manifest file skipping, embedding clusters. */
class JSeriesSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // ------------------------------------------------------------- J4
  test("compaction keeps exactly one row per key, the (ts, event_id) max") {
    val compacted = Compaction.compactLatest(spark, sfDir)
    val valid = Tables.eventsRaw(spark, sfDir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
    // one row per distinct valid key
    assert(compacted.count() == valid.select("user_id").distinct().count())
    // winner = lexicographic (ts, event_id) max per key, via plain agg
    val truth = valid.groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("last_event_id"))
    val diff = compacted.select("user_id", "last_event_id")
      .exceptAll(truth).count()
    assert(diff == 0, s"$diff compacted winners disagree with groupBy-max truth")
  }

  test("compaction plans as WindowGroupLimit (per-task winner pre-filter)") {
    val plan = finalPlan(Compaction.compactLatest(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"),
      s"rn=1 did not rewrite to WindowGroupLimit:\n$plan")
  }

  // ------------------------------------------------------------- J5
  test("holdout split is exhaustive, deterministic, and ~98/1/1") {
    val s1 = Sampling.splitAssign(spark, sfDir)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts("train") / n > 0.95, s"train share off: $counts")
    assert(counts.getOrElse("val", 0L) / n < 0.04, s"val share off: $counts")
    assert(counts.getOrElse("test", 0L) / n < 0.04, s"test share off: $counts")
    // deterministic: a second run assigns identically
    assert(s1.exceptAll(Sampling.splitAssign(spark, sfDir)).count() == 0)
    // independence from G1's sample salt: the val/test docs are not
    // systematically in/out of the "graft"-salted sample
    val both = s1.withColumn("b2", Sampling.hashBucket(col("doc_id"), "graft"))
    val holdout = both.where(col("split") =!= "train")
    assert(holdout.count() > 0, "fixture has no holdout docs — test is vacuous")
  }

  // ------------------------------------------------------------- J6
  test("bloom-pruned semi join is exactly the plain semi join") {
    val urgent = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_linenumber")
    val pruned = BloomJoin.bloomPrunedSemi(spark, li, "l_orderkey",
      urgent, "o_orderkey")
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(pruned.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(pruned).count() == 0)
    assert(plain.count() > 0, "fixture join is empty — test is vacuous")
  }

  test("bloom prefilter prunes disjoint keys at ~fpp and sits in the plan") {
    import spark.implicits._
    val build = (0L until 2000L).toDF("k")
    val probe = (1000000L until 1040000L).toDF("k") // disjoint from build
    val bf = build.stat.bloomFilter("k", 2000, 0.03)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    graft.plans.GraftFunctions.register(spark)
    val passed = probe.where(call_function("graft_might_contain",
      col("k"), lit(out.toByteArray))).count()
    val frac = passed.toDouble / 40000
    assert(frac < 0.10, f"bloom passed $frac%.3f of disjoint keys (fpp=0.03)")
    // and zero false negatives on the build keys themselves
    val kept = build.where(call_function("graft_might_contain",
      col("k"), lit(out.toByteArray))).count()
    assert(kept == 2000, s"bloom dropped ${2000 - kept} genuine keys")
    // the operator's plan carries the probe ahead of the join
    val plan = finalPlan(BloomJoin.qBloomJoin(spark, sfDir))
    assert(plan.contains("graft_might_contain"),
      s"bloom prefilter missing from plan:\n$plan")
  }

  // ------------------------------------------------------------- J7
  test("manifest skipping reads only intersecting files, rows equal flat scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_skip").toString
    try {
      // range-clustered layout: 8 files, each a contiguous ts range
      Tables.eventsRaw(spark, sfDir).where(col("ts").isNotNull)
        .repartitionByRange(8, col("ts"))
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val all = Tables.eventsRaw(spark, tmp)
      val man = SkipIndex.manifest(all, "ts")
      val nFiles = man.count()
      assert(nFiles == 8, s"fixture wrote $nFiles files, want 8")
      // a ~10% slice of the ts span
      val Array(lo0, hi0) = all.agg(min("ts"), max("ts")).collect()(0) match {
        case r => Array(r.getLong(0), r.getLong(1))
      }
      val lo = lo0 + (hi0 - lo0) / 4
      val hi = lo + (hi0 - lo0) / 10
      val cand = SkipIndex.candidateFiles(man, "ts", lo, hi)
      assert(cand.nonEmpty && cand.size < 8,
        s"no pruning: ${cand.size} of $nFiles files selected")
      val pruned = SkipIndex.rangeScanPruned(spark, tmp, lo, hi)
      // the pruned reader touches only candidate files
      assert(pruned.inputFiles.forall(f => cand.exists(c => c.endsWith(f.split("/").last))),
        "pruned read touched a non-candidate file")
      val flat = all.where(col("ts") >= lo && col("ts") < hi)
        .select(col("event_id"), expr("ts DIV 1000").as("ts_us"),
          col("event_type"), col("value"))
      assert(pruned.exceptAll(flat).count() == 0)
      assert(flat.exceptAll(pruned).count() == 0)
      assert(flat.count() > 0, "slice is empty — test is vacuous")
    } finally {
      def rm(g: java.io.File): Unit = {
        if (g.isDirectory) g.listFiles().foreach(rm); g.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("incremental manifest update reads ONLY new files (old rows reused verbatim)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_iman").toString
    try {
      val ev = Tables.eventsRaw(spark, sfDir).where(col("ts").isNotNull)
      val half = ev.agg(expr("percentile(ts, 0.5)")).collect()(0).getDouble(0).toLong
      ev.where(col("ts") < half).repartitionByRange(4, col("ts"))
        .write.parquet(s"$tmp/ev")
      // materialize the stored manifest (collect + recreate), as a
      // real deployment would — a lazy plan would re-scan old files
      val man0rows = SkipIndex.manifest(
        spark.read.schema(Tables.eventsRawSchema).parquet(s"$tmp/ev"), "ts")
      val man0 = spark.createDataFrame(
        spark.sparkContext.parallelize(man0rows.collect().toSeq), man0rows.schema)
      // append newer files, snapshot the full-rebuild truth while intact
      ev.where(col("ts") >= half).repartitionByRange(2, col("ts"))
        .write.mode("append").parquet(s"$tmp/ev")
      val evAll = spark.read.schema(Tables.eventsRawSchema).parquet(s"$tmp/ev")
      val truth = SkipIndex.manifest(evAll, "ts").collect()
        .map(r => (r.getString(0).split("/").last, r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // corrupt the ORIGINAL files: any path that re-reads them fails
      val oldFiles = man0rows.collect().map(_.getString(0))
      oldFiles.foreach { f =>
        val p = java.nio.file.Paths.get(new java.net.URI(
          if (f.startsWith("file:")) f else "file://" + f))
        java.nio.file.Files.write(p, "not parquet".getBytes)
      }
      val man1 = SkipIndex.updateManifest(spark, man0, s"$tmp/ev",
        Tables.eventsRawSchema, "ts").collect()
        .map(r => (r.getString(0).split("/").last, r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(man1 == truth,
        s"incremental manifest diverged from full rebuild:\n${man1 diff truth}\n${truth diff man1}")
      assert(man0rows.schema.fieldNames.sameElements(Seq("file", "n_rows", "min_ts", "max_ts")))
    } finally {
      def rm(g: java.io.File): Unit = {
        if (g.isDirectory) g.listFiles().foreach(rm); g.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("an all-outside range prunes every file and returns empty") {
    // the sf fixture is a single file; a disjoint range must skip it
    val man = SkipIndex.manifest(Tables.eventsRaw(spark, sfDir), "ts")
    val cand = SkipIndex.candidateFiles(man, "ts", 1L, 2L) // 1970 — before any event
    assert(cand.isEmpty)
    assert(SkipIndex.rangeScanPruned(spark, sfDir, 1L, 2L).count() == 0)
  }

  // ------------------------------------------------------------- J8
  test("embedding clusters: labels are transitive-closed minima of C5 pairs") {
    val pairs = Dedup.embeddingNearDup(spark, sfDir)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup pairs — test is vacuous")
    val clusters = Dedup.embedClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = pairs.flatMap(p => Seq(p._1, p._2)).distinct.map(v => v -> find(v)).toMap
    assert(clusters == truth)
  }
}
