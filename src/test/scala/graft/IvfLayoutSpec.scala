package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** D7 gates: the cid-partitioned on-disk IVF index prunes FILES at
  * listing time (partition filter + strict file-count reduction) and
  * answers identically to the same search over a flat copy of the
  * same rows — the J2 layout-invisibility contract on the vector
  * store. */
class IvfLayoutSpec extends SparkSpec {

  test("probe reads only probed cid directories; flat copy answers identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfidx").toFile.getPath
    try {
      SimilaritySearch.writeIvfIndex(spark, sfDir, dir, k = 16, iters = 2)
      // flat control: same rows, no partitioning
      spark.read.parquet(s"$dir/ivf.parquet")
        .select("vec_id", "embedding", "cid")
        .write.mode("overwrite").parquet(s"$dir/ivf_flat.parquet")

      def parquetFiles(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(parquetFiles).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      val totalFiles = parquetFiles(new java.io.File(s"$dir/ivf.parquet"))
      assert(totalFiles > 4, s"index must span multiple cid partitions, got $totalFiles")

      val part = SimilaritySearch.ivfIndexTopK(spark, dir,
        nQueries = 3, nProbe = 1)
      part.collect()
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case other => other.children.flatMap(scans)
      }
      // the probed read is the scan WITH a cid partition filter (the
      // query-collection scan reads the index too, unfiltered)
      val probedScan = scans(part.queryExecution.executedPlan)
        .find(_.partitionFilters.exists(_.toString.contains("cid")))
        .getOrElse(fail("no cid partition filter on any scan"))
      val filesRead = probedScan.metrics("numFiles").value
      assert(filesRead < totalFiles,
        s"partition pruning read every file ($filesRead of $totalFiles)")

      val flat = SimilaritySearch.ivfIndexTopK(spark, dir,
        nQueries = 3, nProbe = 1, flatPath = Some(s"$dir/ivf_flat.parquet"))
      assert(part.exceptAll(flat).isEmpty && flat.exceptAll(part).isEmpty,
        "partitioned index diverged from the flat copy — layout changed an answer")
      assert(part.count() > 0, "no hits — probe too narrow to test anything")
      println(s"[ivflayout] probed read $filesRead of $totalFiles files")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
