package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Sampling}
import graft.sources.Tables

/** K1/K2 behavior + plan contracts: chunking, weighted sampling. */
class KSeriesSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // ------------------------------------------------------------- K1
  test("chunks tile every doc: cover all chars, stride apart, no sub-range tail") {
    val w = Chunking.Window
    val s = Chunking.Stride
    val ch = Chunking.chunks(spark, sfDir).persist()
    try {
      val docs = Tables.documents(spark, sfDir).select(
        col("doc_id"), length(col("text")).as("len"))
      // per doc: chunk 0 exists, indexes are dense 0..max, ends cover len
      val agg = ch.groupBy("doc_id").agg(
        count(lit(1)).as("n"), max("chunk_ix").as("mx"),
        max("char_end").as("cover"), min("char_start").as("st0"))
        .join(docs, "doc_id")
      assert(agg.where(col("n") =!= col("mx") + 1 || col("st0") =!= 0).count() == 0,
        "chunk indexes must be dense from 0")
      assert(agg.where(col("cover") =!= col("len")).count() == 0,
        "chunks must cover the full document")
      assert(ch.count() == Tables.documents(spark, sfDir)
        .select(sum(floor(greatest(length(col("text")) - Chunking.Overlap - 1,
          lit(0)) / s) + 1)).collect()(0).getLong(0))
      // chunk_text really is the [char_start, char_end) substring
      val joined = ch.join(Tables.documents(spark, sfDir), "doc_id")
        .where(col("chunk_text") =!= expr(
          s"substring(text, CAST(char_start + 1 AS INT), $w)"))
      assert(joined.count() == 0, "chunk_text must equal the offset substring")
      // every chunk but the last contributes exactly stride new chars
      val short = ch.where(col("char_end") - col("char_start") < w)
        .groupBy("doc_id").agg(count(lit(1)).as("n"), max("chunk_ix").as("mxs"))
      val maxIx = ch.groupBy("doc_id").agg(max("chunk_ix").as("mx"))
      val nonTail = short.join(maxIx, "doc_id")
        .where(col("mxs") =!= col("mx")).count()
      assert(nonTail == 0, "only the final chunk may be short")
    } finally ch.unpersist()
  }

  test("chunking plans shuffle-free: generate+project over one scan") {
    val phys = Chunking.chunks(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(phys.contains("Generate"), s"explode missing:\n$phys")
    assert(!phys.contains("Exchange"),
      s"chunk generation must be narrow (no shuffle):\n$phys")
  }

  // ------------------------------------------------------------- K2
  test("weighted sample: k per source, deterministic, monotone in weight") {
    val k = Sampling.WeightedK
    val s1 = Sampling.weightedSample(spark, sfDir).persist()
    try {
      val sizes = s1.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val avail = Tables.documents(spark, sfDir).groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      avail.foreach { case (src, n) =>
        assert(sizes.getOrElse(src, 0L) == math.min(n, k.toLong),
          s"source $src: want min($n, $k) sampled, got ${sizes.get(src)}")
      }
      // deterministic rerun
      assert(s1.exceptAll(Sampling.weightedSample(spark, sfDir)).count() == 0)
      // weighting bites: the sampled docs skew longer than the corpus
      val meanAll = Tables.documents(spark, sfDir)
        .agg(avg("n_chars")).collect()(0).getDouble(0)
      val meanSampled = s1.agg(avg("n_chars")).collect()(0).getDouble(0)
      assert(meanSampled > meanAll,
        f"length-weighted sample should skew long: $meanSampled%.1f vs corpus $meanAll%.1f")
    } finally s1.unpersist()
  }

  test("weighted sample plans as WindowGroupLimit (per-task quota pre-filter)") {
    val plan = finalPlan(Sampling.weightedSample(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k did not rewrite to WindowGroupLimit:\n$plan")
  }

  // ------------------------------------------------------------- K5
  test("tf-idf: scores are exact rationals, ranks deterministic, quota planned") {
    val df = graft.operators.CorpusStats.tfidfTopTerms(spark, sfDir)
    val plan = finalPlan(df)
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc quota did not rewrite to WindowGroupLimit:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"scalar N join must broadcast, not cartesian:\n$plan")
    // rank 1's score >= rank 2's within every doc
    val w = df.select("doc_id", "rank", "score").collect()
      .groupBy(_.getLong(0)).values
    w.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "scores must be non-increasing in rank")
    }
  }

  // ------------------------------------------------------------- K9
  test("snapshot diff classifies added/removed/changed and drops unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val neu = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("doc_id", "text")
    val got = graft.operators.SnapshotDiff.diff(old, neu)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"),
      s"got $got")
  }

  test("snapshot diff treats NULL text as a value, not as row absence") {
    import spark.implicits._
    // 1: NULL both sides (unchanged, must NOT appear), 2: NULL→text
    // (changed, not 'added'), 3: text→NULL (changed, not 'removed'),
    // 4: genuinely added with NULL text, 5: genuinely removed with
    // NULL text
    val old = Seq((1L, null: String), (2L, null: String), (3L, "c"),
      (5L, null: String)).toDF("doc_id", "text")
    val neu = Seq((1L, null: String), (2L, "b"), (3L, null: String),
      (4L, null: String)).toDF("doc_id", "text")
    val got = graft.operators.SnapshotDiff.diff(old, neu)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "changed",
      4L -> "added", 5L -> "removed"), s"got $got")
  }

  // ------------------------------------------------------------- K6
  test("source drift: TV in [0,1], top token gap positive, no cartesian blowup") {
    val df = graft.operators.CorpusStats.sourceDrift(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tv = r.getDouble(1)
      assert(tv >= 0.0 && tv <= 1.0, s"TV out of range: $tv for ${r.getString(0)}")
      assert(r.getDouble(3) > 0.0,
        "the most over-represented token must be over-represented")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"scalar joins must broadcast, not cartesian:\n$plan")
  }

  test("source drift on a single-source corpus is NULL by definition, not div-zero noise") {
    import spark.implicits._
    val docs = Seq((1L, "web", "a b c"), (2L, "web", "a d"))
      .toDF("doc_id", "source", "text")
    val rows = graft.operators.CorpusStats.sourceDriftFrom(docs).collect()
    assert(rows.length == 1 && rows(0).getString(0) == "web")
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2) && rows(0).isNullAt(3),
      s"degenerate drift must be NULL, got ${rows(0)}")
  }
}
