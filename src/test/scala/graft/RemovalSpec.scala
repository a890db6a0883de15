package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup, Removal, SnapshotDiff, SpanDedup, Winnowing}

/** M4: governed removal propagation — the composition poison-proof.
  * Each maintainer is individually poison-proofed in its own suite
  * (U8/N6/Y8); this proves the COMPOSITION: one removal delta routed
  * through every artifact leaves each maintained artifact bit-equal
  * to a from-scratch rebuild on the remaining corpus, with survivors'
  * text corrupted in every frame maintenance touches (a removal must
  * never re-read what it isn't removing). */
class RemovalSpec extends SparkSpec {

  import spark.implicits._

  // doc 2 is the CANONICAL of an exact-dup group whose other member
  // (doc 1) survives — removal must hand the crown over; doc 5 shares
  // its span grams with nobody — its grams must leave the span index
  // entirely; docs 3/4 share grams with doc 5's text partially
  private val longRun = (1 to Winnowing.GuaranteeTokens + 8)
  private def docs = Seq(
    (1L, "src_a", longRun.map(i => s"alpha$i").mkString(" ")),
    (2L, "src_a", longRun.map(i => s"alpha$i").mkString(" ")),
    (3L, "src_b", longRun.map(i => s"beta$i").mkString(" ") + " " +
      longRun.take(SpanDedup.SpanK + 2).map(i => s"shared$i").mkString(" ")),
    (4L, "src_b", longRun.map(i => s"gamma$i").mkString(" ") + " " +
      longRun.take(SpanDedup.SpanK + 2).map(i => s"shared$i").mkString(" ")),
    (5L, "src_c", longRun.map(i => s"unique$i").mkString(" ") + " " +
      longRun.take(SpanDedup.SpanK + 2).map(i => s"shared$i").mkString(" ")))
    .toDF("doc_id", "source", "text")

  private val removeSet = Seq(2L, 5L)

  private def sortedRows(df: DataFrame) =
    df.collect().map(_.toSeq.toList).sortBy(_.toString)

  test("composition: every maintained artifact equals the rebuild on remaining docs (survivor text poisoned)") {
    val intact = docs
    val remaining = intact.where(!col("doc_id").isin(removeSet: _*))
    val removeIds = Seq(2L, 5L).toDF("doc_id")
    val delta = removeIds.select(col("doc_id"), lit("removed").as("change"))
    // maintenance must read text ONLY from the removal set (span
    // subtraction) — survivors arrive corrupted
    val poisoned = intact.withColumn("text",
      when(col("doc_id").isin(removeSet: _*), col("text"))
        .otherwise(lit("POISON unread")))

    val ex = SnapshotDiff.maintainExactDedup(
      Dedup.exactFrom(intact), poisoned, delta)
    assert(sortedRows(ex).sameElements(sortedRows(Dedup.exactFrom(remaining))))
    // the crown handoff: doc 1 is now its own canonical, not a dup
    val r1 = ex.where(col("doc_id") === 1L).head()
    assert(r1.getAs[Long]("canonical_id") == 1L && !r1.getAs[Boolean]("is_dup"))

    val tok = CorpusStats.maintainTokenCounts(
      CorpusStats.tokenCounts(intact), poisoned, delta)
    assert(sortedRows(tok).sameElements(
      sortedRows(CorpusStats.tokenCounts(remaining))))

    val fp = Winnowing.maintainFpIndex(spark,
      Winnowing.fpValuesFrom(spark, intact), poisoned, delta)
    assert(sortedRows(fp).sameElements(
      sortedRows(Winnowing.fpValuesFrom(spark, remaining))))

    // span subtraction reads the REMOVED docs' intact text
    val span = SpanDedup.maintainSpanIndexRemoval(spark,
      SpanDedup.spanGramIndex(spark, intact),
      intact.join(removeIds, Seq("doc_id"), "left_semi"))
    assert(sortedRows(span).sameElements(
      sortedRows(SpanDedup.spanGramIndex(spark, remaining))))
    // doc 5's unique grams are fully exhausted (no zero-count rows
    // linger); the shared grams survive with decremented counts
    assert(span.where(col("occ_old") <= 0).count() == 0)
  }

  test("audit form: four artifacts, zero residue, exact-dup checksum reflects the crown handoff") {
    val removeIds = Seq(2L, 5L).toDF("doc_id")
    val out = Removal.removalAuditFrom(spark, docs, removeIds).collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("exact_verdicts", "span_gram_index", "token_counts",
        "winnow_fp_index"))
    assert(out.forall(_.getAs[Long]("n_residue") == 0L))
    val ex = out.find(_.getString(0) == "exact_verdicts").get
    // 3 surviving docs, none a dup once the canonical's twin left
    assert(ex.getAs[Long]("n_rows") == 3L)
    assert(ex.getAs[Long]("checksum") == 0L)
  }

  test("M5: streamed removal micro-batches converge to the batch rebuild (two triggers)") {
    // takedown ids arrive in TWO micro-batches (one file per trigger);
    // after the stream drains, the on-disk artifacts must equal a
    // from-scratch rebuild on the remaining corpus bit-for-bit —
    // anti-join and count-subtraction maintenance compose across any
    // batch split
    val intact = docs
    val remaining = intact.where(!col("doc_id").isin(removeSet: _*))
    val tmp = java.nio.file.Files.createTempDirectory("graft_rm").toString
    try {
      Winnowing.fpValuesFrom(spark, intact)
        .write.parquet(s"$tmp/fp")
      SpanDedup.spanGramIndex(spark, intact)
        .write.parquet(s"$tmp/span")
      // one file per removal id -> maxFilesPerTrigger=1 gives two
      // genuine micro-batches
      Seq(2L).toDF("doc_id").coalesce(1).write.parquet(s"$tmp/in/a")
      Seq(5L).toDF("doc_id").coalesce(1).write.parquet(s"$tmp/in/b")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType)))
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$tmp/in/*")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          Removal.removalMicroBatch(spark, b, intact,
            s"$tmp/fp", s"$tmp/span")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val fpFinal = sortedRows(spark.read.parquet(s"$tmp/fp"))
      val spanFinal = sortedRows(spark.read.parquet(s"$tmp/span"))
      assert(fpFinal.sameElements(
        sortedRows(Winnowing.fpValuesFrom(spark, remaining))))
      assert(spanFinal.sameElements(
        sortedRows(SpanDedup.spanGramIndex(spark, remaining))))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("removing an unknown id is a no-op in every artifact") {
    val out = Removal.removalAuditFrom(spark, docs,
      Seq(999L).toDF("doc_id")).collect()
    val ex = out.find(_.getString(0) == "exact_verdicts").get
    assert(ex.getAs[Long]("n_rows") == 5L)
    assert(ex.getAs[Long]("checksum") == 1L) // the 1/2 dup pair intact
    assert(out.forall(_.getAs[Long]("n_residue") == 0L))
  }
}
