package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.BinaryAnn
import graft.plans.BitPack

/** Z1 binary-quantization properties: the packed words are a pure
  * function of element SIGNS (so any positive rescale leaves them
  * bit-identical), bits land where the SQL twin's Σ 2^j chain puts
  * them, short arrays fail fast instead of silently diverging from the
  * oracle, and the end-to-end query has the ANN contract shape. */
class BqAnnSpec extends SparkSpec {

  import spark.implicits._

  private def packOne(v: Seq[Float]): Seq[Long] =
    Seq(Tuple1(v.toArray)).toDF("embedding")
      .select(Vectors.bitpackFast(spark, col("embedding")).as("w"))
      .as[Seq[Long]].head()

  test("bit j of word w is exactly sign(emb[32w+j] > 0)") {
    // one-hot positives: element i alone positive => word i/32 reads
    // 2^(i%32), the other word reads 0 — the SQL twin's literal chain
    for (i <- Seq(0, 1, 31, 32, 63)) {
      val v = Array.fill(BitPack.Dims)(-1.0f).updated(i, 0.5f).toSeq
      val words = packOne(v)
      assert(words.length == BitPack.Words)
      val expected = Seq.tabulate(BitPack.Words)(w =>
        if (w == i / 32) 1L << (i % 32) else 0L)
      assert(words == expected, s"one-hot at $i packed as $words")
    }
    // zero is NOT positive: all-zero vector packs to all-zero words
    assert(packOne(Seq.fill(BitPack.Dims)(0.0f)) == Seq.fill(BitPack.Words)(0L))
  }

  test("packing is sign-scale invariant and deterministic across repartition") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 64L).map(i =>
      (i, Array.fill(BitPack.Dims)((rnd.nextGaussian() * 3).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val scaled = df.select(col("vec_id"),
      expr("transform(embedding, x -> x * 7.5f)").as("embedding"))
    val a = df.select(col("vec_id"), Vectors.bitpackFast(spark, col("embedding")).as("w"))
    val b = scaled.repartition(7)
      .select(col("vec_id"), Vectors.bitpackFast(spark, col("embedding")).as("w"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "packed words changed under positive rescale / repartition")
  }

  test("short arrays fail fast (oracle divergence guard)") {
    val short = Seq(Tuple1(Array.fill(BitPack.Dims - 1)(1.0f))).toDF("embedding")
    val e = intercept[Exception] {
      short.select(Vectors.bitpackFast(spark, col("embedding"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("serving over the persisted packed index equals the self-contained query") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bqidx").toString
    try {
      BinaryAnn.writeBqIndex(spark, sfDir, tmp)
      val fromIdx = BinaryAnn.bqTopKFromIndex(spark, sfDir, tmp)
      val self = BinaryAnn.bqTopK(spark, sfDir)
      assert(fromIdx.exceptAll(self).isEmpty && self.exceptAll(fromIdx).isEmpty,
        "index-served BQ diverged from the self-contained form")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("packed-index maintenance is pure append: delta rows union to the full rebuild") {
    // packing is a stateless pure function of each row, so index
    // maintenance under corpus growth is an APPEND of the new batch's
    // packed rows — no global recompute, no read-modify-write (the H4
    // asymmetry, trivial here by construction; this pins it)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val old = emb.where(col("vec_id") % 5 =!= 0)
    val delta = emb.where(col("vec_id") % 5 === 0)
    def packed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), Vectors.bitpackFast(spark, col("embedding")).as("words"))
    val appended = packed(old).unionByName(packed(delta))
    val rebuilt = packed(emb)
    assert(appended.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(appended).isEmpty,
      "append-maintained packed index diverged from the full rebuild")
  }

  test("q_ann_bq has the ANN contract shape: K rows per query, rank total order") {
    val out = BinaryAnn.bqTopK(spark, sfDir).cache()
    try {
      val perQuery = out.groupBy("query_id").count().as[(Long, Long)].collect()
      assert(perQuery.nonEmpty)
      assert(perQuery.forall(_._2 == 5L), s"per-query counts: ${perQuery.toSeq}")
      // rank is 1..K per query and self never appears
      assert(out.where(col("rank") < 1 || col("rank") > 5).isEmpty)
      assert(out.where(col("query_id") === col("vec_id")).isEmpty)
    } finally out.unpersist()
  }
}
