package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SimilaritySearch}

/** Recall gates for the approximate operators: on CLUSTERED vectors
  * (the workload ANN indexes exist for) IVF must find nearly everything
  * brute force finds — so centroid/nprobe regressions become test
  * failures instead of silent recall collapse. The sf tables'
  * embeddings are uniform random, where bucketing provably can't help;
  * this fixture plants the cluster structure instead.
  */
class AnnRecallSpec extends SparkSpec {

  /** 4 tight clusters × 50 vectors, 64 dims, deterministic seed; the
    * operator's query set (vec_id < 8) covers every cluster via
    * vec_id % 4 label assignment. */
  private var fixtureCreated: Option[java.io.File] = None

  override def afterAll(): Unit = {
    try fixtureCreated.foreach(deleteTree)
    finally super.afterAll()
  }

  private def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteTree)
    f.delete()
  }

  private lazy val fixtureDir: String = {
    val root = Files.createTempDirectory("graft_ann").toFile
    fixtureCreated = Some(root)
    val dir = root.getPath
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(4)(Array.fill(64)(rnd.nextGaussian()))
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      val label = i % 4
      val emb = centers(label).map(c => (c + 0.05 * rnd.nextGaussian()).toFloat)
      (i.toLong, emb, label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("IVF recall@5 >= 0.9 vs brute force on clustered vectors") {
    val brute = SimilaritySearch.bruteTopK(spark, fixtureDir)
      .select("query_id", "vec_id")
    val ivf = SimilaritySearch.ivfTopK(spark, fixtureDir)
      .select("query_id", "vec_id")
    val nTrue = brute.count()
    val hit = ivf.join(brute, Seq("query_id", "vec_id")).count()
    assert(nTrue > 0)
    val recall = hit.toDouble / nTrue
    assert(recall >= 0.9, s"IVF recall collapsed: $recall ($hit/$nTrue)")
  }

  test("PQ-ADC recall@5 >= 0.9 vs brute force, on fixture and real embeddings") {
    for (dir <- Seq(fixtureDir, sfDir)) {
      val brute = SimilaritySearch.bruteTopK(spark, dir)
        .select("query_id", "vec_id")
      val pq = SimilaritySearch.pqTopK(spark, dir)
        .select("query_id", "vec_id")
      val nTrue = brute.count()
      val hit = pq.join(brute, Seq("query_id", "vec_id")).count()
      assert(nTrue > 0)
      val recall = hit.toDouble / nTrue
      assert(recall >= 0.9, s"PQ recall collapsed on $dir: $recall ($hit/$nTrue)")
    }
  }

  test("IVF-PQ recall@5 >= 0.9 on clustered vectors (coarse probe + ADC codes)") {
    val brute = SimilaritySearch.bruteTopK(spark, fixtureDir)
      .select("query_id", "vec_id")
    val ivfpq = SimilaritySearch.ivfPqTopK(spark, fixtureDir, c = 4)
      .select("query_id", "vec_id")
    val nTrue = brute.count()
    val hit = ivfpq.join(brute, Seq("query_id", "vec_id")).count()
    assert(nTrue > 0)
    val recall = hit.toDouble / nTrue
    assert(recall >= 0.9, s"IVF-PQ recall collapsed: $recall ($hit/$nTrue)")
  }

  test("binary-quantized ANN recall@5 >= 0.9 on clustered vectors (Z1)") {
    // sign-bit hamming shortlist + exact rescore: on clustered vectors
    // the deep 1-bit rescore shortlist must recover the brute top-K
    val brute = SimilaritySearch.bruteTopK(spark, fixtureDir)
      .select("query_id", "vec_id")
    val bq = graft.operators.BinaryAnn.bqTopK(spark, fixtureDir)
      .select("query_id", "vec_id")
    val nTrue = brute.count()
    val hit = bq.join(brute, Seq("query_id", "vec_id")).count()
    assert(nTrue > 0)
    val recall = hit.toDouble / nTrue
    assert(recall >= 0.9, s"BQ recall collapsed: $recall ($hit/$nTrue)")
  }

  test("IVF-BQ recall@5 >= 0.9 on clustered vectors (coarse probe + hamming, Z5)") {
    val brute = SimilaritySearch.bruteTopK(spark, fixtureDir)
      .select("query_id", "vec_id")
    val ivfbq = SimilaritySearch.ivfBqTopK(spark, fixtureDir, c = 4)
      .select("query_id", "vec_id")
    val nTrue = brute.count()
    val hit = ivfbq.join(brute, Seq("query_id", "vec_id")).count()
    assert(nTrue > 0)
    val recall = hit.toDouble / nTrue
    assert(recall >= 0.9, s"IVF-BQ recall collapsed: $recall ($hit/$nTrue)")
  }

  test("trained (unsupervised) IVF recall@5 >= 0.9 without touching label") {
    // the fixture's label column exists but must be IGNORED: training
    // sees only (vec_id, embedding), as a real unlabeled corpus would
    val brute = SimilaritySearch.bruteTopK(spark, fixtureDir)
      .select("query_id", "vec_id")
    val ivf = SimilaritySearch.ivfTopKTrained(spark, fixtureDir, k = 4)
      .select("query_id", "vec_id")
    val nTrue = brute.count()
    val hit = ivf.join(brute, Seq("query_id", "vec_id")).count()
    assert(nTrue > 0)
    val recall = hit.toDouble / nTrue
    assert(recall >= 0.9, s"trained IVF recall collapsed: $recall ($hit/$nTrue)")
  }

  test("trained centroids separate the planted clusters") {
    import spark.implicits._
    // every trained centroid should sit in exactly one planted cluster:
    // max cosine to one cluster center high, and the 4 centroids should
    // map onto 4 distinct clusters (farthest-point seeding's job)
    val cents = SimilaritySearch.trainCentroids(spark,
      spark.read.parquet(s"$fixtureDir/embeddings.parquet")
        .select("vec_id", "embedding"), k = 4)
    assert(cents.count() == 4)
    val emb = spark.read.parquet(s"$fixtureDir/embeddings.parquet")
    val best = emb.join(cents)
      .select(col("label"), col("cid"),
        graft.functions.Vectors.cosine(col("embedding"), col("c_emb")).as("cos"))
      .groupBy("cid").agg(max(struct(round(col("cos"), 9), col("label"))).as("b"))
      .select($"b".getField("label").as("label"))
    assert(best.distinct().count() == 4,
      "two trained centroids collapsed onto the same planted cluster")
  }

  test("SRP bucket count grows with corpus size (bounded expected population)") {
    // the bit-width ladder keeps expected bucket population <= target
    // until the srpMaxBits cap — the property that kills the old
    // fixed-16-bucket O(n^2/16) self-join
    assert(Dedup.srpUsedBits(500) < Dedup.srpUsedBits(2000))
    assert(Dedup.srpUsedBits(2000) < Dedup.srpUsedBits(1000000))
    for (n <- Seq(100L, 1000L, 10000L, 100000L, 1000000L)) {
      val buckets = 1L << Dedup.srpUsedBits(n)
      assert(n.toDouble / buckets <= Dedup.srpTargetPop,
        s"expected population for n=$n is ${n.toDouble / buckets}")
    }
    assert(Dedup.srpUsedBits(1L << 40) == Dedup.srpMaxBits)
  }

  test("embedding near-dup with scaled buckets still finds high-cosine pairs") {
    // clusters at cosine ~0.99+ within, ~0 across: the multi-probe
    // sketch join must keep finding within-cluster pairs
    val pairs = Dedup.embeddingNearDup(spark, fixtureDir)
    assert(pairs.count() > 0, "scaled SRP found no near-dup pairs")
    assert(pairs.where(col("cos_sim") < 0.35).count() == 0)
  }
}
