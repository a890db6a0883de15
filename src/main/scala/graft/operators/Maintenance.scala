package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Table-maintenance planning — the layout half of a 100 TB pipeline's
  * operational loop, complementing the read-side pruning ladder
  * (J2 partition keys → J7/K8 stats manifests → row-group stats).
  *
  * A streaming ingest (A9) writing a micro-batch per trigger per
  * partition produces the classic small-file problem: a year of
  * 1-minute triggers is ~500k files whose per-file overhead (task
  * schedule, footer read, open/seek) dominates the scan. The fix is
  * periodic compaction, and the expensive half of compaction is the
  * REWRITE — so the planner's job is to decide which files to touch
  * and what to merge into what, reading nothing but the stats
  * manifest. [[planCompactionFrom]] is that planner as a relational
  * operator: manifest in, per-file rewrite assignment out.
  */
object Maintenance {

  /** Files at or above this size are left alone — rewriting them buys
    * nothing and costs a full copy. (Production: ~0.5-1× the target;
    * here scaled to the fixture's ~8 KB pseudo-files so BOTH branches
    * of the plan are exercised and oracle-checked.) */
  val SmallBytes = 8200L

  /** Target size of a merged output file (production: 128-1024 MB —
    * `maxPartitionBytes`-scale so one compacted file is one scan
    * split). */
  val TargetBytes = 16000L

  /** N4: compaction plan over a (file, n_rows, est_bytes) stats
    * manifest ordered by `file` (the range-cluster key — J7's
    * manifest lists files in min-key order, so adjacency in this
    * order IS range adjacency).
    *
    * Rules, in order:
    *   1. files ≥ [[SmallBytes]] are `keep` — their own output file,
    *      zero rewrite bytes;
    *   2. small files merge only within RUNS of consecutive small
    *      files (gaps-and-islands on the count of preceding keeps):
    *      merging across a kept file would produce an output whose
    *      key range overlaps the keeper's, degrading the very
    *      manifest pruning (J7) compaction exists to protect —
    *      overlap costs candidate files on every future range read,
    *      forever, vs one slightly-small output now;
    *   3. within a run, files bin greedily by byte prefix sum:
    *      `bin = floor(start_offset / TargetBytes)` — I1's
    *      concatenate-then-chunk rule applied to bytes, so every
    *      output file lands in [TargetBytes - max_small, TargetBytes
    *      + max_small) except a run's last.
    *
    * Every input file maps to exactly one output file (`out_file` =
    * the group's first member; keeps map to themselves), so the plan
    * doubles as the rewrite manifest diff K8 ingests: rows with
    * out_file ≠ file are rewritten, their manifest rows replaced by
    * one row per new out_file.
    *
    * Scale shape: the input is METADATA — one row per file, ~10⁶ rows
    * (≈ tens of MB) for a 100 TB table — the same driver-bounded
    * artifact class as a partition listing, so the global-order
    * windows here are windows over a listing, not over data. (If a
    * manifest ever outgrew that class, the PrefixSum two-level
    * pattern applies verbatim with a key-prefix bucket; the rule is
    * unchanged.) The plan never touches the data files themselves —
    * that is the executor-side rewrite job the plan feeds.
    */
  def planCompactionFrom(man: DataFrame, targetBytes: Long = TargetBytes,
                         smallBytes: Long = SmallBytes): DataFrame = {
    val wOrd = Window.orderBy("file")
    val wRun = Window.partitionBy("run").orderBy("file")
    val wGrp = Window.partitionBy("run", "bin")
    val planned = man
      .withColumn("small", col("est_bytes") < smallBytes)
      // run id = #keeps at-or-before this row: constant within a run
      // of smalls, bumps at every keep — keeps get their own id space
      .withColumn("run",
        sum(when(col("small"), 0).otherwise(1)).over(wOrd))
      .withColumn("start_off",
        when(col("small"),
          sum(when(col("small"), col("est_bytes")).otherwise(0L)).over(wRun)
            - col("est_bytes")))
      .withColumn("bin",
        when(col("small"), floor(col("start_off") / lit(targetBytes.toDouble)))
          .otherwise(lit(-1L)))
    planned
      .withColumn("action", when(col("small"), "merge").otherwise("keep"))
      .withColumn("out_file",
        when(col("small"), min(when(col("small"), col("file"))).over(wGrp))
          .otherwise(col("file")))
      .withColumn("out_bytes",
        when(col("small"), sum(when(col("small"), col("est_bytes"))).over(wGrp))
          .otherwise(col("est_bytes")))
      .withColumn("out_n_files",
        when(col("small"), count(when(col("small"), lit(1))).over(wGrp))
          .otherwise(lit(1L)))
      .select("file", "n_rows", "est_bytes", "action",
        "out_file", "out_bytes", "out_n_files")
      .orderBy("file")
  }

  /** The oracle-able fixture instance: pseudo-files are the event
    * log's UTC days (exactly what the J2 layout writes — one
    * directory per `event_date`, here one file each), with a
    * deterministic encoded-size proxy both engines compute from the
    * rows: 16 B fixed + the props payload. The production input is
    * the real K8 manifest (size column from the file status); the
    * planner is the same [[planCompactionFrom]] — JSeriesSpec runs it
    * over a real `input_file_name()` manifest too. */
  def dailyFileStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // UTC day, derived arithmetically: date_format on a timestamp
      // renders in the session zone (date_format on a DATE does not)
      .select(date_format(graft.functions.Portable.utcDateOfMicros(
          unix_micros(col("ts_us"))), "yyyy-MM-dd").as("file"),
        col("props"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col("props")) + lit(16L)).as("est_bytes"))

  def compactionPlan(spark: SparkSession, dir: String): DataFrame =
    planCompactionFrom(dailyFileStats(spark, dir))

  val compactionPlanSql: String =
    s"""WITH man AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS file,
      |    count(*) AS n_rows,
      |    CAST(sum(length(props) + 16) AS BIGINT) AS est_bytes
      |  FROM events GROUP BY 1),
      |runs AS (
      |  SELECT file, n_rows, est_bytes,
      |    est_bytes < $SmallBytes AS small,
      |    sum(CASE WHEN est_bytes < $SmallBytes THEN 0 ELSE 1 END)
      |      OVER (ORDER BY file
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM man),
      |binned AS (
      |  SELECT *,
      |    CASE WHEN small THEN CAST(floor(
      |      (sum(CASE WHEN small THEN est_bytes ELSE 0 END)
      |         OVER (PARTITION BY run ORDER BY file
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |       - est_bytes) / $TargetBytes.0) AS BIGINT)
      |    ELSE -1 END AS bin
      |  FROM runs)
      |SELECT file, n_rows, est_bytes,
      |  CASE WHEN small THEN 'merge' ELSE 'keep' END AS action,
      |  CASE WHEN small THEN min(CASE WHEN small THEN file END)
      |    OVER (PARTITION BY run, bin) ELSE file END AS out_file,
      |  CASE WHEN small THEN CAST(sum(CASE WHEN small THEN est_bytes END)
      |    OVER (PARTITION BY run, bin) AS BIGINT) ELSE est_bytes END AS out_bytes,
      |  CASE WHEN small THEN count(CASE WHEN small THEN 1 END)
      |    OVER (PARTITION BY run, bin) ELSE 1 END AS out_n_files
      |FROM binned
      |ORDER BY file""".stripMargin
}
