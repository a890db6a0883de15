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
  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft_ann").toFile.getPath
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
