package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main for interactive dev; not part of the contract.
  * Current probe: the semantic-dedup VERDICT-SENSITIVITY floor — how
  * much do keep/drop verdicts churn between two equally-legitimate
  * EXACT clusterings (k vs k-1, both full-corpus-trained)? This is
  * the baseline any approximate-assignment agreement number must be
  * judged against: if exact-vs-exact churns comparably, verdict
  * identity is not a stable property of the operator on this corpus,
  * and the honest contract is the structural keep/witness properties
  * plus a bounded-churn note. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val x = sys.env.get("SPARK_GRAFT_SCALE_X").map(_.toInt).getOrElse(1)
    val dir = if (x <= 1) base else {
      val tmp = java.nio.file.Files.createTempDirectory("graft_dev").toFile.getPath
      ProbeLab.blowUpEmbeddings(spark, base, tmp, x)
      tmp
    }
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val n = emb.count()
      val k = operators.SemanticDedup.autoK(n)
      def verdicts(kk: Int) = operators.SemanticDedup
        .dedupAssigned(spark,
          operators.SemanticDedup.assignTo(spark, emb,
            operators.SimilaritySearch.trainCentroids(spark, emb, kk, 3)), 0.35)
        .select(col("vec_id"), col("keep"))
      for (k2 <- Seq(k - 1, k + 1)) {
        val a = verdicts(k).select(col("vec_id"), col("keep").as("ka"))
        val b = verdicts(k2).select(col("vec_id"), col("keep").as("kb"))
        val agree = a.join(b, Seq("vec_id"))
          .where(col("ka") === col("kb")).count()
        println(f"[dev] n=$n exact k=$k vs exact k=$k2: verdict agreement ${agree * 100.0 / n}%6.2f%%")
      }
    } finally {
      if (x > 1) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(new java.io.File(dir))
      }
      spark.stop()
    }
  }
}
