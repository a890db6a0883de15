package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Maintenance, Sampling, TextAnalysis}
import graft.sources.Tables

/** N-series: audits (split leakage, language confusion, semantic
  * decontamination) and table maintenance (compaction planning). */
class NSeriesSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- N1
  test("split leakage equals the pair-set x split join, quarantines the later split") {
    val got = Dedup.splitLeakage(spark, sfDir).collect()
    val splits = Sampling.splitAssign(spark, sfDir)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Dedup.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => splits(a) != splits(b) }
    assert(got.length == expected.length)
    val rank = Map("train" -> 0, "val" -> 1, "test" -> 2)
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getString(2) == splits(a) && r.getString(3) == splits(b))
      assert(r.getString(2) != r.getString(3), "same-split pair reported")
      val quarantine =
        if (rank(splits(a)) > rank(splits(b))) a else b
      assert(r.getLong(5) == quarantine,
        s"pair ($a,$b): quarantined ${r.getLong(5)}, expected $quarantine")
    }
  }

  // ------------------------------------------------------------- N5
  test("semantic split leakage equals the embedding pair-set x split derivation") {
    val got = Dedup.splitLeakageSemantic(spark, sfDir).collect()
    // vec_id shares the doc id space, so the J5 assignment covers it
    val splits = Sampling.splitAssign(spark, sfDir)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Dedup.embeddingNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => splits(a) != splits(b) }
    assert(got.length == expected.length,
      s"got ${got.length} straddling pairs, expected ${expected.length}")
    assert(got.nonEmpty, "fixture must exercise the straddle path")
    val rank = Map("train" -> 0, "val" -> 1, "test" -> 2)
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getString(2) == splits(a) && r.getString(3) == splits(b))
      assert(r.getString(2) != r.getString(3), "same-split pair reported")
      val quarantine = if (rank(splits(a)) > rank(splits(b))) a else b
      assert(r.getLong(5) == quarantine,
        s"pair ($a,$b): quarantined ${r.getLong(5)}, expected $quarantine")
    }
  }

  // ------------------------------------------------------------- N2
  test("language confusion matrix partitions the corpus; agree column is honest") {
    val cells = TextAnalysis.langConfusion(spark, sfDir).collect()
    assert(cells.map(_.getLong(3)).sum == Tables.documents(spark, sfDir).count())
    cells.foreach { c =>
      assert(c.getBoolean(2) == (c.getString(0) == c.getString(1)))
      assert(c.getLong(3) > 0, "empty cells must not be emitted")
    }
    // exact equality with a recompute from E1's own per-doc output
    val expected = TextAnalysis.langId(spark, sfDir).collect()
      .groupBy(r => (r.getString(6), r.getString(5)))
      .map { case (k, rs) => k -> rs.length.toLong }
    assert(cells.map(c => (c.getString(0), c.getString(1)) -> c.getLong(3)).toMap
      == expected)
    // the audit's fixture FINDING: the synthetic corpus's text is
    // English-ish regardless of the declared tag — declared en
    // agrees, every other declared language has ZERO diagonal. This
    // is the untrustworthy-metadata situation the operator exists to
    // surface before anything keys on `lang`.
    val byDeclared = cells.groupBy(_.getString(0))
    val en = byDeclared("en")
    assert(en.filter(_.getBoolean(2)).map(_.getLong(3)).sum >
      en.filterNot(_.getBoolean(2)).map(_.getLong(3)).sum)
    for ((lang, row) <- byDeclared if lang != "en")
      assert(row.filter(_.getBoolean(2)).map(_.getLong(3)).sum == 0,
        s"$lang: fixture unexpectedly self-consistent")
  }

  // ------------------------------------------------------------- N3
  test("semantic decontamination matches a local brute-force recompute") {
    val got = Dedup.decontaminateSemantic(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // recompute: probe membership by the fixed-count hash-order rule
    // (the SemProbeCount smallest salted md5s), cosines in plain
    // scala over the collected fixture (500 vectors at sf0.001)
    val all = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        md5(concat(col("vec_id").cast("string"), lit(":benchvec"))).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getString(2)))
    val probes = all.sortBy(t => (t._3, t._1)).take(Dedup.SemProbeCount)
    assert(probes.length == Dedup.SemProbeCount && probes.length < all.length)
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        d += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
        i += 1
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val expected = (for {
      (vid, v, _) <- all
      (bid, b, _) <- probes
      if vid != bid
      c = cos(v, b) if c >= 0.35
    } yield (vid, bid)).toSet
    assert(got.map(t => (t._1, t._2)).toSet == expected)
    got.foreach { case (_, _, c, flagged) =>
      assert(c >= 0.35 && flagged == (c >= 0.40))
    }
  }

  // ------------------------------------------------------------- N4
  private def plan(rows: Seq[(String, Long, Long)],
                   target: Long = 100L, small: Long = 60L) =
    Maintenance.planCompactionFrom(
      rows.toDF("file", "n_rows", "est_bytes"), target, small).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5), r.getLong(6)))

  test("compaction plan: keeps untouched, merge groups within runs, greedy bound") {
    val rows = Seq(
      ("f01", 1L, 30L), ("f02", 1L, 30L), ("f03", 1L, 30L), ("f04", 1L, 30L),
      ("f05", 1L, 200L), // big file splits the run
      ("f06", 1L, 50L), ("f07", 1L, 50L), ("f08", 1L, 50L),
      ("f09", 1L, 999L), ("f10", 1L, 10L))
    val out = plan(rows)
    val byFile = out.map(t => t._1 -> t).toMap
    // keeps map to themselves, bytes preserved
    for (f <- Seq("f05", "f09")) {
      val t = byFile(f)
      assert(t._3 == "keep" && t._4 == f && t._6 == 1L)
    }
    // no merge group spans a keep: group members are contiguous and
    // all inside one run
    val groups = out.filter(_._3 == "merge").groupBy(_._4)
    for ((g, ms) <- groups) {
      val names = ms.map(_._1).sorted
      assert(g == names.head, "group labeled by its first member")
      val keeps = out.filter(_._3 == "keep").map(_._1)
      assert(!keeps.exists(k => k > names.head && k < names.last),
        s"group $g spans kept file")
      // out_bytes is the member sum, consistent across members
      assert(ms.map(_._5).distinct.length == 1)
      assert(ms.head._5 == ms.map(_._2).sum)
      assert(ms.head._6 == ms.length.toLong)
    }
    // greedy bound: a file joins group k while its START offset is
    // below (k+1)*target, so group bytes land in
    // [target - max_member, target + max_member) except a run's last.
    // run 1 smalls: 4x30, starts 0/30/60/90 all < 100 -> ONE group of
    // 120 (overshoot 20 < max_member 30)
    assert(Seq("f01", "f02", "f03", "f04").forall(byFile(_)._4 == "f01"))
    assert(byFile("f01")._5 == 120L && byFile("f01")._6 == 4L)
    // run 2: 3x50 -> [0,100),[100,150): f06+f07 then f08
    assert(byFile("f06")._4 == "f06" && byFile("f07")._4 == "f06"
      && byFile("f08")._4 == "f08")
    // trailing run of one tiny file is its own group
    assert(byFile("f10")._4 == "f10" && byFile("f10")._3 == "merge")
  }

  test("compaction plan is a partition: every input in exactly one output, bytes conserved") {
    val out = Maintenance.compactionPlan(spark, sfDir).collect()
    assert(out.nonEmpty)
    val totalIn = out.map(_.getLong(2)).sum
    val outFiles = out.groupBy(_.getString(4))
    val totalOut = outFiles.values.map(_.head.getLong(5)).sum
    assert(totalIn == totalOut, "bytes conserved across the rewrite")
    assert(outFiles.size <= out.length)
    for ((of, ms) <- outFiles) {
      assert(ms.head.getLong(6) == ms.length.toLong)
      assert(ms.map(_.getString(0)).min == of)
    }
  }

  test("compaction plan of an all-big manifest is the identity") {
    val rows = Seq(("a", 1L, 500L), ("b", 1L, 500L))
    val out = plan(rows)
    assert(out.forall(t => t._3 == "keep" && t._4 == t._1 && t._6 == 1L))
  }
}
