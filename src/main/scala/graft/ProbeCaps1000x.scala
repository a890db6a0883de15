package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TopK, Vectors}
import graft.operators.{BinaryAnn, Dedup, Winnowing}

/** Evidence tool for the three serving-path caps one decade BEYOND
  * the standing 100× gate (the J3/P3 planted-skew discipline applied
  * at 1000× of sf0.1 — ~50M docs / ~50M vectors, the scale where an
  * F-dependent term would already be fatal):
  *
  *  - **WinnowBucketCap** (Y3 pair generation): a boilerplate
  *    fingerprint shared by F docs detonates the uncapped fp join at
  *    F²/2 pairs out of one bucket (measured OOM at F = 50k in the
  *    round-18 100× probe). Here the planting makes F = 500k — 10×
  *    the fatal F — and the capped [[Winnowing.winnowPairsFrom]] must
  *    price flat, because cap²/2 per bucket does not see F.
  *  - **BucketCap** (C2 candidate generation): F = 500k IDENTICAL
  *    docs put F members into each of the 4 band buckets; the capped
  *    bucket-collect emits ≤ 4·C(cap, 2) planted pairs however large
  *    F grows.
  *  - **ShortM** (Z1 hamming shortlist): F = 500k duplicated
  *    embeddings make every nearby query's zero-hamming tie group
  *    F-sized; the TopK partial aggregation is F-invariant by algebra
  *    (each partition reduces to ShortM rows before any shuffle), so
  *    shortlist rows stay NQueries·ShortM exactly.
  *
  * Phase 0 (untimed) writes the planted 1000× tables to disk; each
  * probe then times ONLY the serving kernel over the on-disk frame,
  * reporting wall seconds + emitted rows as JSON lines (the
  * ProbeWinnowSkew format). Measurement only — the correctness gate
  * never sees these tables; capped ≡ oracle is gated at verify SFs.
  *
  * Run: sbt "runMain graft.ProbeCaps1000x [base100xDir] [x] [outDir]"
  */
object ProbeCaps1000x {

  private val Stride2 = 100000000000L // second-level copy stride

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/tmp/graft_100x"
    val x = if (args.length > 1) args(1).toInt else 10
    val out = if (args.length > 2) args(2) else "/tmp/graft_caps1000x"
    val stride = if (args.length > 3) args(3).toLong else 100L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, base, x, out, stride)
    finally spark.stop()
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def run(spark: SparkSession, base: String, x: Int, out: String,
          hotStride: Long = 100L): Unit = {

    // ---- phase 0 (untimed): planted 1000× tables on disk ----------
    // (skipped when the planted tables already exist — probes re-run
    // against the same build after a kernel change)
    val built = new java.io.File(s"$out/emb.parquet/_SUCCESS").exists()
    if (!built) buildTables(spark, base, x, out, hotStride)

    val nDocs = spark.read.parquet(s"$out/docs_win.parquet").count()
    val nVecs = spark.read.parquet(s"$out/emb.parquet").count()
    val f = nDocs / hotStride
    println(s"[caps1000x] built: $nDocs docs, $nVecs vecs, planted F=$f")
    probes(spark, out, nDocs, nVecs, f)
  }

  private def buildTables(spark: SparkSession, base: String, x: Int,
                          out: String, hotStride: Long): Unit = {
    val docs0 = spark.read.parquet(s"$base/documents.parquet")
      .select("doc_id", "text")
    val mx = docs0.agg(max(col("doc_id"))).head().getLong(0)
    require(mx < Stride2, s"doc_id max $mx >= stride $Stride2")
    def docs1000(copyTag: String): DataFrame = (0 until x).map { i =>
      docs0.select((col("doc_id") + lit(i * Stride2)).as("doc_id"),
        // token-prefix per copy (the ScaleUp device): no cross-copy
        // shingle/fingerprint collides except the PLANTED skew below
        regexp_replace(col("text"), "(\\S+)", s"d${copyTag}${i}x$$1")
          .as("text"))
    }.reduce(_ unionByName _)

    val winTemplate = (1 to Winnowing.GuaranteeTokens + 3)
      .map(i => s"hotfp$i").mkString(" ")
    // winnow probe table: template APPENDED to every hotStride-th doc
    // (one corpus-wide hot fingerprint, organic text otherwise)
    docs1000("w").withColumn("text",
      when(pmod(col("doc_id"), lit(hotStride)) === 0,
        concat(col("text"), lit(" " + winTemplate)))
        .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$out/docs_win.parquet")
    // LSH probe table: every hotStride-th doc REPLACED by the
    // identical template (one F-member bucket per band)
    docs1000("l").withColumn("text",
      when(pmod(col("doc_id"), lit(hotStride)) === 0, lit(winTemplate))
        .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$out/docs_lsh.parquet")

    val emb0 = spark.read.parquet(s"$base/embeddings.parquet")
      .select("vec_id", "embedding")
    val hotVec = emb0.orderBy("vec_id").limit(1)
      .head().getSeq[Float](1)
    val hotLit = array(hotVec.map(v => lit(v)): _*)
    (0 until x).map { i =>
      val rot = s"($i % size(embedding))"
      emb0.select((col("vec_id") + lit(i * Stride2)).as("vec_id"),
        expr(s"concat(slice(embedding, $rot + 1, size(embedding) - $rot), " +
          s"slice(embedding, 1, $rot))").as("embedding"))
    }.reduce(_ unionByName _)
      .withColumn("embedding",
        when(pmod(col("vec_id"), lit(hotStride)) === 0, hotLit)
          .otherwise(col("embedding")))
      .write.mode("overwrite").parquet(s"$out/emb.parquet")
  }

  private def probes(spark: SparkSession, out: String, nDocs: Long,
                     nVecs: Long, f: Long): Unit = {
    // ---- probe 1: WinnowBucketCap ---------------------------------
    val dw = spark.read.parquet(s"$out/docs_win.parquet")
    val (wPairs, wSec) = time {
      Winnowing.winnowPairsFrom(spark, dw).count()
    }
    println(s"""[caps1000x] {"probe":"winnow_cap","n_docs":$nDocs,""" +
      f""""planted_f":$f,"pairs":$wPairs,"sec":$wSec%.1f}""")

    // ---- probe 2: BucketCap (C2 candidate generation) -------------
    val dl = spark.read.parquet(s"$out/docs_lsh.parquet")
    val (lPairs, lSec) = time {
      Dedup.bandsOf(spark, dl)
        .groupBy("band", "key")
        .agg(TopK.minIds(spark, Dedup.BucketCap, col("doc_id")).as("sids"))
        .where(size(col("sids")) > 1)
        .select(explode(expr(
          """flatten(transform(sids, (a, i) ->
            |  transform(slice(sids, i + 2, size(sids)),
            |            b -> named_struct('doc_a', a, 'doc_b', b))))"""
            .stripMargin)).as("p"))
        .where(col("p.doc_a") < col("p.doc_b"))
        .select(countDistinct(col("p.doc_a"), col("p.doc_b")))
        .head().getLong(0)
    }
    println(s"""[caps1000x] {"probe":"lsh_bucket_cap","n_docs":$nDocs,""" +
      f""""planted_f":$f,"pairs":$lPairs,"sec":$lSec%.1f}""")

    // ---- probe 2b: the PAYLOAD-carrying C4 verify path ------------
    // (the one-pass (doc_id, sh)-struct bucket collect OOM'd an 8 GB
    // JVM here; the shipped two-pass cappedShBuckets form must price)
    val (vPairs, vSec) = time {
      Dedup.verifiedPairsAt(spark, Dedup.shingledSig(spark, dl), 4, 3)
        .count()
    }
    println(s"""[caps1000x] {"probe":"c4_verify_payload","n_docs":$nDocs,""" +
      f""""planted_f":$f,"pairs":$vPairs,"sec":$vSec%.1f}""")

    // ---- probe 3: ShortM (Z1 hamming shortlist) -------------------
    val pe = spark.read.parquet(s"$out/emb.parquet")
    val (sRows, sSec) = time {
      val packed = pe.select(col("vec_id"),
        Vectors.bitpackFast(spark, col("embedding")).as("words"))
      val queries = broadcast(packed.where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("words").as("q_words")))
      val ham = BinaryAnn.hammingOf("words", "q_words")
      packed.join(queries, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          (-ham).cast("double").as("score"))
        .groupBy("query_id")
        .agg(TopK.topk(spark, BinaryAnn.ShortM, col("vec_id"),
          col("score")).as("hits"))
        .select(col("query_id"), explode(col("hits")).as("h"))
        .count()
    }
    println(s"""[caps1000x] {"probe":"bq_shortlist","n_vecs":$nVecs,""" +
      f""""planted_f":$f,"shortlist_rows":$sRows,"sec":$sSec%.1f}""")
  }
}
