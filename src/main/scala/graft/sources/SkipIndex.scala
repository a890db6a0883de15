package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J7: file-level min/max data skipping over NON-partition columns —
  * the stats-manifest idiom of Delta/Iceberg/Hudi, built from plain
  * parquet with no table format: one narrow pass groups row-level
  * values by `input_file_name()` into a per-file (min, max, count)
  * manifest; a range query consults the manifest FIRST and hands the
  * planner only the files whose range can intersect.
  *
  * This completes the pruning ladder (SURVEY §5): J2's partition
  * layout prunes on the partition key at listing time; this prunes on
  * any clustered ORDINARY column (ts in an append-ordered log, doc_id
  * in an id-sorted corpus) — the case where re-partitioning the
  * layout is too expensive but files are naturally range-clustered.
  * Parquet row-group stats do the same pruning INSIDE each file, but
  * only after the scan task opened the footer; the manifest skips the
  * file before a task is even scheduled — at 100 TB the difference
  * between launching 10⁶ tasks that each read a footer and launching
  * 10³.
  *
  * The manifest is tiny (one row per file) and mergeable: at scale it
  * is maintained incrementally — new files append their stats row
  * (one footer read), compaction rewrites the affected rows — not
  * rebuilt per query; [[manifest]] is the bootstrap/backfill pass.
  * Null-stat semantics: a file whose column is entirely NULL has NULL
  * min/max and is correctly skipped by any range predicate (NULL
  * never matches a range); files mixing nulls keep non-null min/max,
  * and rows with NULL values never satisfy the re-applied row filter.
  */
object SkipIndex {

  /** Per-file stats manifest for `c` over one narrow pass: (file,
    * n_rows, min_c, max_c). Shuffles one tiny row per (task, file). */
  def manifest(df: DataFrame, c: String): DataFrame =
    df.select(input_file_name().as("file"), col(c))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))

  /** Incremental manifest maintenance — the at-scale form of
    * [[manifest]]: stats for files ALREADY in the manifest are reused
    * verbatim (their rows are immutable once written — parquet files
    * never change in place), and only files NEW to the directory are
    * opened. An append of F' files to a 10⁶-file table costs F'
    * footer-scale reads, not a corpus pass; compaction is handled by
    * the same diff (rewritten files appear as new paths, dropped
    * paths fall out via the anti-join against the current listing). */
  def updateManifest(spark: SparkSession, man: DataFrame, dir: String,
                     schema: org.apache.spark.sql.types.StructType,
                     c: String): DataFrame = {
    import spark.implicits._
    // `input_file_name()` (manifest rows) and `inputFiles` (listing)
    // render the scheme differently (file:///p vs file:/p) — compare
    // on the normalized path, keep each side's original string.
    def norm(s: String): String = s.replaceFirst("^file:/+", "/")
    val listed = spark.read.schema(schema).parquet(dir).inputFiles.toSeq
    val known = man.select("file").collect().map(r => norm(r.getString(0))).toSet
    val fresh = listed.filterNot(f => known.contains(norm(f)))
    val kept = man
      .withColumn("filep", regexp_replace(col("file"), "^file:/+", "/"))
      .join(listed.map(norm).toDF("filep").hint("broadcast"),
        Seq("filep"), "left_semi")
      .drop("filep")
    if (fresh.isEmpty) kept
    else kept.unionByName(
      manifest(spark.read.schema(schema).parquet(fresh: _*), c))
  }

  /** Files whose [min, max] may intersect [lo, hi) — the candidate
    * set; NULL stats (all-null files) compare to NULL and drop. The
    * collect is the file LIST (one short string per surviving file),
    * the same bounded-driver-artifact class as a partition listing. */
  def candidateFiles(man: DataFrame, c: String, lo: Long, hi: Long): Seq[String] =
    man.where(col(s"max_$c") >= lo && col(s"min_$c") < hi)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Manifest-pruned range read: build (or at scale: consult) the
    * manifest, read ONLY candidate files, re-apply the row predicate
    * (file granularity over-approximates). Row-equal to the flat
    * filtered scan by construction — the row filter is re-applied in
    * full, so manifest staleness or range over-approximation can only
    * cost files read, never correctness. */
  def rangeScanPruned(spark: SparkSession, dir: String,
                      loNs: Long, hiNs: Long): DataFrame = {
    val man = manifest(Tables.eventsRaw(spark, dir), "ts")
    val files = candidateFiles(man, "ts", loNs, hiNs)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          Tables.eventsRawSchema)
      // candidate re-read dispatches on the vintage of the FILES THE
      // MANIFEST NAMES — not the dir probe: under the partitioned-
      // layout override the manifest indexes the partitioned copies
      // (nanos BIGINT) while the flat dir is µs TIMESTAMP, and the
      // dir-keyed probe mis-typed the re-read (every row dropped —
      // caught by the layout-override oracle gate). A µs file read
      // under the pinned nanos schema would silently yield µs longs
      // the same way; the range is restated on the physical column so
      // the candidate scan still row-group-prunes inside each file.
      else {
        val raw = spark.read.parquet(files: _*)
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType =>
            Tables.normalizeMicrosEvents(
              raw.where(Tables.microsTsRangePred(raw.schema("ts").dataType, loNs, hiNs)))
          case _ =>
            spark.read.schema(Tables.eventsRawSchema).parquet(files: _*)
        }
      }
    base.where(col("ts") >= loNs && col("ts") < hiNs)
      .select(col("event_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** 2024-01-10 .. 2024-01-12 (UTC), as parquet nanos — a 2-day slice
    * of the fixture's 31-day log, the shape of a backfill read. */
  val RangeLoNs: Long = 1704844800000000000L
  val RangeHiNs: Long = 1705017600000000000L

  def skipScan(spark: SparkSession, dir: String): DataFrame =
    rangeScanPruned(spark, dir, RangeLoNs, RangeHiNs)

  val skipScanSql: String =
    """SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
      |ORDER BY event_id""".stripMargin
}
