package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // dump-only oracle fallbacks must train on THIS run's dir (see
    // OracleContext) — set before any query or oracle SQL evaluates
    graft.operators.OracleContext.dir.set(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Corpus precondition for gram-based oracle parity: the native
    // Shingles/GramStats expressions return [""] for NULL/empty text
    // while their DuckDB twins drop such docs — every gram query's
    // parity therefore ASSUMES the verify corpus has non-degenerate
    // text. Fail loudly here if a future corpus breaks that, instead
    // of surfacing as a confusing per-query hash diff.
    locally {
      import org.apache.spark.sql.functions.{col, length}
      val degenerate = graft.sources.Tables.documents(spark, sfDir)
        .where(col("text").isNull || length(col("text")) === 0).count()
      require(degenerate == 0,
        s"$degenerate null/empty-text docs in $sfDir — gram-query oracle " +
          "parity does not hold on degenerate text (see GramOps.scala)")
    }
    new java.io.File(outDir).mkdirs()
    // Optional subset (comma-separated names) for local iteration; the
    // driver leaves it unset and dumps the full suite.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
