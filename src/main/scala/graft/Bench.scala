package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and emits ONE JSON line (stdout) plus a file copy (BENCH.json or
  * $SPARK_GRAFT_BENCH_OUT) so the driver's parse is log-format
  * independent. A failing query records an "errors" entry instead of
  * masquerading as a fast timing. */
object Bench {
  def main(args: Array[String]): Unit = {
    // Host load before/after the run: the shared host shows up-to-2×
    // variance, and a skewed run is only interpretable next to the
    // loadavg it ran under (1/5/15-min averages from the OS).
    def loadavg: String =
      scala.util.Try(Files.readString(Paths.get("/proc/loadavg"))
        .split("\\s+").take(3).mkString("[", ",", "]")).getOrElse("null")
    val loadStart = loadavg
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorbs JVM/codegen/parquet-footer startup cost so
    // the first timed query isn't charged for it.
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    // Best-of-N per query: the host shows up-to-2x run-to-run variance
    // (r2: 56 s for a 100k-row scan that takes 1.3 s steady-state), so a
    // single shot cannot distinguish noise from regression. All runs are
    // reported ("runs") so the spread itself is visible; "queries" keeps
    // the per-query minimum and "value" their sum.
    val reps = scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").trim.toInt)
      .getOrElse(3).max(1)
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val allRuns = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Optional subset (comma-separated names) for local iteration; the
    // driver leaves it unset and gets the full suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: ${unknown.mkString(", ")}")
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val runs = scala.collection.mutable.ArrayBuffer[Double]()
      var failed = false
      var r = 0
      while (r < reps && !failed) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          runs += (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            failed = true
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        r += 1
      }
      if (runs.nonEmpty && !failed) {
        timings(name) = runs.min
        allRuns(name) = runs.toSeq
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // Millisecond precision on the wire: the driver captures only a
    // bounded TAIL of stdout, and r3's full-precision line (with the
    // per-rep "runs" object) overflowed it — the driver recorded
    // "parsed": null. The stdout line stays compact (rounded values, no
    // runs); the file copy keeps every rep at full precision.
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val loadEnd = loadavg
    val qs = timings.map { case (k, v) => s"${jstr(k)}:${r3(v)}" }.mkString("{", ",", "}")
    val rs = allRuns.map { case (k, v) => s"${jstr(k)}:${v.mkString("[", ",", "]")}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"reps":$reps,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"load_start":$loadStart,"load_end":$loadEnd,"sf":${jstr(sfDir)}}"""
    println(line)
    Files.writeString(Paths.get(out),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$rs,"reps":$reps,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"load_start":$loadStart,"load_end":$loadEnd,"sf":${jstr(sfDir)}}""" + "\n")
    spark.stop()
    if (errors.nonEmpty) System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
  }
}
