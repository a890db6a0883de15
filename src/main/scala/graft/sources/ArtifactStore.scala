package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe, replay-idempotent maintenance of a standing on-disk
  * parquet artifact (fingerprint indexes, gram indexes, the corpus
  * snapshot itself) under Structured Streaming's at-least-once
  * `foreachBatch` contract.
  *
  * Two failure modes of the naive read-then-overwrite-in-place both
  * corrupt the ONLY copy of a compliance artifact:
  *
  *  1. **Replay double-apply**: foreachBatch re-executes a failed
  *     micro-batch; a non-idempotent maintenance step (the span
  *     index's count SUBTRACTION) applied twice silently over-evicts
  *     grams surviving docs still carry. Fix: each artifact directory
  *     carries a `_graft_applied` marker (underscore-prefixed, so
  *     Spark's file listing ignores it) recording the last applied
  *     batchId; [[maintain]] skips any batch already recorded —
  *     batchIds are monotone and stable across retries, so skip iff
  *     `applied >= batchId`.
  *
  *  2. **Mid-overwrite crash**: `mode("overwrite")` on the path being
  *     read deletes the old state before the new one exists (and a
  *     lineage recompute after lost cached blocks re-reads the
  *     half-written directory). Fix: never overwrite in place — write
  *     the full next state to `<dir>.tmp`, then swap via two renames
  *     (`dir`→`<dir>.old`, `<dir>.tmp`→`dir`) and drop the old copy.
  *     Rename is atomic on HDFS-like stores and local filesystems; a
  *     crash inside the swap window leaves `<dir>.old` intact and
  *     [[recover]] restores it (the batch then replays normally).
  *
  * All paths go through the Hadoop FileSystem API so the same code
  * runs against local disk, HDFS, or any Hadoop-compatible object
  * store with atomic rename. */
object ArtifactStore {

  private val MarkerName = "_graft_applied"

  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Last batchId applied to the artifact at `dir`, or -1 when no
    * marker exists (a freshly built artifact predates any batch). */
  def appliedBatch(spark: SparkSession, dir: String): Long = {
    val (f, p) = fs(spark, dir)
    val m = new Path(p, MarkerName)
    if (!f.exists(m)) -1L
    else {
      val in = f.open(m)
      try {
        // read to EOF: the InputStream contract allows partial reads
        // (realistic on HDFS/object-store streams), and a short read
        // of "1" from "12" would yield a wrong applied batchId — the
        // exact double-apply hazard the marker exists to prevent
        val bytes = new Array[Byte](64)
        var n = 0
        var r = in.read(bytes, n, bytes.length - n)
        while (r > 0) { n += r; r = in.read(bytes, n, bytes.length - n) }
        new String(bytes, 0, n, StandardCharsets.UTF_8).trim.toLong
      } finally in.close()
    }
  }

  /** Restore `dir` if a crash landed inside a previous swap window:
    * when `dir` is missing but `<dir>.old` exists, the old state is
    * the known-good pre-batch copy — rename it back (the interrupted
    * batch replays through the marker gate). Any leftover `<dir>.tmp`
    * is stale either way and is dropped. */
  def recover(spark: SparkSession, dir: String): Unit = {
    val (f, p) = fs(spark, dir)
    val old = new Path(dir + ".old")
    if (!f.exists(p) && f.exists(old)) {
      require(f.rename(old, p), s"recover: rename $old -> $p failed")
    }
    val tmp = new Path(dir + ".tmp")
    if (f.exists(tmp)) f.delete(tmp, true)
    if (f.exists(p) && f.exists(old)) f.delete(old, true)
  }

  /** Publish `next` as the new state of `dir`, stamped with
    * `batchId`: full write to `<dir>.tmp` (the read of `dir` inside
    * `next`'s lineage executes HERE, while `dir` is untouched — no
    * checkpoint needed), then the two-rename swap. */
  def commit(spark: SparkSession, next: DataFrame, dir: String,
             batchId: Long): Unit = {
    val (f, p) = fs(spark, dir)
    val tmp = new Path(dir + ".tmp")
    val old = new Path(dir + ".old")
    if (f.exists(tmp)) f.delete(tmp, true)
    next.write.mode("overwrite").parquet(tmp.toString)
    val out = f.create(new Path(tmp, MarkerName), true)
    try out.write(batchId.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(old)) f.delete(old, true)
    if (f.exists(p)) require(f.rename(p, old), s"swap: $p -> $old failed")
    require(f.rename(tmp, p), s"swap: $tmp -> $p failed")
    if (f.exists(old)) f.delete(old, true)
  }

  /** Sweep a PARENT directory (e.g. a hive-partitioned layout root)
    * for children left by an interrupted swap — `<name>.old` /
    * `<name>.tmp` — and [[recover]] each base path. A partitioned
    * layout whose buckets are maintained individually needs this
    * before any full-layout read: a stale `cid=3.tmp` child would
    * otherwise be picked up by partition discovery as a malformed
    * partition value. */
  def recoverAll(spark: SparkSession, parentDir: String): Unit = {
    val (f, p) = fs(spark, parentDir)
    if (!f.exists(p)) return
    f.listStatus(p).foreach { st =>
      val name = st.getPath.getName
      if (name.endsWith(".old") || name.endsWith(".tmp"))
        recover(spark, new Path(p, name.stripSuffix(".old")
          .stripSuffix(".tmp")).toString)
    }
  }

  /** The maintenance gate: recover from any interrupted swap, skip
    * the batch if this artifact already absorbed it, else compute the
    * next state from the current one and commit. `update` must be a
    * pure function of the on-disk state (it is re-run on replay of a
    * not-yet-applied batch). Returns true when the batch was applied,
    * false when skipped as already applied. */
  def maintain(spark: SparkSession, dir: String, batchId: Long)(
      update: DataFrame => DataFrame): Boolean = {
    recover(spark, dir)
    if (appliedBatch(spark, dir) >= batchId) false
    else {
      commit(spark, update(spark.read.parquet(dir)), dir, batchId)
      true
    }
  }
}
