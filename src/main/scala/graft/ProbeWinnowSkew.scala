package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Winnowing

/** Evidence tool for the winnowPairs bucket cap (the J3/P3
  * planted-skew discipline, BASELINE.md "winnowPairs hot-fingerprint
  * cap"): the round-17 cap exists because a boilerplate fingerprint
  * shared by F docs makes the fp equi-join emit F²/2 pairs out of ONE
  * bucket — a detonation the uniform bench corpus cannot see (its
  * hottest fingerprint is shared by a handful of docs). This probe
  * PLANTS the skew: every `stride`-th document gets a fixed template
  * run (≥ the winnowing guarantee length, so the template contributes
  * ≥1 shared fingerprint across all planted docs) appended to its
  * text, then times the pair generation PRE-cap (the round-16
  * fp-equi-SELF-JOIN shape, reconstructed here — the shipped in-array
  * combination explode cannot run uncapped at all: a 30k-member
  * bucket would materialize C(30k,2) structs inside ONE row before
  * the Generate streams them, which is itself part of the evidence)
  * vs POST-cap (the shipped [[Winnowing.winnowPairsFrom]] at
  * [[Winnowing.WinnowBucketCap]]) on the same planted frame,
  * reporting wall seconds and emitted pair counts. The pre-cap leg's pair count grows with F² while the
  * post-cap leg's is bounded by cap²/2 + the organic pairs — the
  * measured curve a 100 TB deployment extrapolates (10M-doc template
  * → ~10¹³ pairs uncapped vs ~5·10⁵ capped).
  *
  * Run: sbt "runMain graft.ProbeWinnowSkew <dir> <stride> [stride...]"
  * — one planted run per stride (smaller stride = hotter bucket:
  * F ≈ nDocs/stride). Measurement only — the correctness gate never
  * sees the planted frame; capped-vs-oracle equivalence is gated by
  * q_winnow_pairs and the WinnowingSpec planted-cap case.
  */
object ProbeWinnowSkew {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProbeWinnowSkew <sfDir> <stride> [stride...]")
    val dir = args(0)
    val strides = args.drop(1).map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val template = (1 to Winnowing.GuaranteeTokens + 3)
        .map(i => s"hotfp$i").mkString(" ")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val nDocs = docs.count()
      val results = strides.flatMap { stride =>
        val planted = docs.withColumn("text",
          when(pmod(col("doc_id"), lit(stride.toLong)) === 0,
            concat(col("text"), lit(" " + template)))
            .otherwise(col("text")))
          .localCheckpoint() // fingerprinting cost is NOT the measurand
        val f = nDocs / stride
        // the round-16 uncapped shape: fp equi-self-join, pairs
        // STREAMED through the join (no in-row array), so the pre-cap
        // leg measures join detonation rather than OOMing on a
        // single giant array value
        def uncappedJoin() = {
          val fv = Winnowing.fpValuesFrom(spark, planted)
          fv.select(col("doc_id").as("doc_a"), col("fp"))
            .join(fv.select(col("doc_id").as("doc_b"), col("fp")), Seq("fp"))
            .where(col("doc_a") < col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(count(lit(1)).as("n_shared_fp"))
        }
        Seq(
          ("post_cap", () => Winnowing.winnowPairsFrom(spark, planted)),
          ("pre_cap", () => uncappedJoin())
        ).map { case (leg, mk) =>
          val t0 = System.nanoTime()
          val n = mk().count()
          val sec = (System.nanoTime() - t0) / 1e9
          val line = f"""{"leg":"$leg","stride":$stride,"planted_docs":$f,""" +
            f""""pairs":$n,"sec":$sec%.3f}"""
          println(s"[winnowskew] $line")
          line
        }
      }
      println(s"""{"probe":"winnow_skew","n_docs":$nDocs,""" +
        s""""runs":[${results.mkString(",")}]}""")
    } finally spark.stop()
  }
}
