package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{SkipIndex, Tables, ZOrder}

/** K4: Z-order layout → J7 manifests prune on BOTH columns. */
class ZOrderSpec extends SparkSpec {

  test("interleave is monotone-compatible: distinct coords, distinct z; locality holds") {
    import spark.implicits._
    val pts = for (a <- 0L until 8L; b <- 0L until 8L) yield (a, b)
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleave(col("a"), col("b"), 3).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.values.toSet.size == 64, "z must be injective on the grid")
    assert(got((0L, 0L)) == 0L && got((7L, 7L)) == 63L)
    // bit i of a at position 2i+1, bit i of b at 2i
    assert(got((1L, 0L)) == 2L && got((0L, 1L)) == 1L && got((2L, 1L)) == 9L)
  }

  test("z-ordered layout prunes files on EITHER column; ts-only layout cannot") {
    val root = Files.createTempDirectory("graft_z").toFile
    try {
      val ev = Tables.eventsRaw(spark, sfDir)
        .where(col("ts").isNotNull && col("user_id").isNotNull)
      val n = 16
      ZOrder.writeZOrdered(ev, "ts", "user_id", n, s"$root/z")
      ev.repartitionByRange(n, col("ts"))
        .write.mode("overwrite").parquet(s"$root/flat_ts")

      def bounds(c: String) = {
        val r = ev.agg(min(col(c)), max(col(c))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val (tsLo, tsHi) = bounds("ts")
      val (uLo, uHi) = bounds("user_id")
      // narrow slices: ~1/8 of each dimension's span
      val tsSlice = (tsLo + (tsHi - tsLo) / 2, tsLo + (tsHi - tsLo) / 2 + (tsHi - tsLo) / 8)
      val uSlice = (uLo + (uHi - uLo) / 2, uLo + (uHi - uLo) / 2 + (uHi - uLo) / 8)

      def cand(path: String, c: String, lo: Long, hi: Long): Int = {
        val df = spark.read.schema(Tables.eventsRawSchema).parquet(path)
        SkipIndex.candidateFiles(SkipIndex.manifest(df, c), c, lo, hi).size
      }
      val zTs = cand(s"$root/z", "ts", tsSlice._1, tsSlice._2)
      val zU = cand(s"$root/z", "user_id", uSlice._1, uSlice._2)
      val flatU = cand(s"$root/flat_ts", "user_id", uSlice._1, uSlice._2)
      assert(zTs < n, s"z layout: ts slice should prune, got $zTs/$n files")
      assert(zU < n, s"z layout: user slice should prune, got $zU/$n files")
      assert(zU < flatU,
        s"z layout must beat ts-range layout on the user slice: $zU vs $flatU")

      // pruned read row-equals the flat filter (the J7 contract)
      val zdf = spark.read.schema(Tables.eventsRawSchema).parquet(s"$root/z")
      val man = SkipIndex.manifest(zdf, "user_id")
      val files = SkipIndex.candidateFiles(man, "user_id", uSlice._1, uSlice._2)
      val pruned = spark.read.schema(Tables.eventsRawSchema).parquet(files: _*)
        .where(col("user_id") >= uSlice._1 && col("user_id") < uSlice._2)
      val flat = ev.where(col("user_id") >= uSlice._1 && col("user_id") < uSlice._2)
      assert(pruned.exceptAll(flat).count() == 0)
      assert(flat.exceptAll(pruned).count() == 0)
      assert(flat.count() > 0, "user slice is empty — test is vacuous")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(root)
    }
  }

  test("writeZOrdered accepts non-long ordered columns (int, timestamp)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_z_int").toFile
    try {
      val df = (0 until 256).map { i =>
        (i, new java.sql.Timestamp(1700000000000L + i * 60000L), s"row$i")
      }.toDF("k", "at", "payload")
      // pre-fix this threw ClassCastException (Integer/Timestamp → getLong)
      ZOrder.writeZOrdered(df, "k", "at", 4, s"$root/z")
      val back = spark.read.parquet(s"$root/z")
      assert(back.count() == 256)
      assert(back.schema("k").dataType.typeName == "integer",
        "layout must not rewrite column types")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(root)
    }
  }
}
