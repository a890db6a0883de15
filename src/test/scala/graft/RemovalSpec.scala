package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Dedup, Removal, SemanticDedup, SnapshotDiff, SpanDedup, Winnowing}

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
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
          Removal.removalMicroBatch(spark, b, bid, intact,
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

      // RESTART / at-least-once replay: foreachBatch may re-deliver a
      // batch it already ran (crash after the artifact writes, before
      // the checkpoint commit). Count subtraction is not idempotent —
      // the applied-batch gate must make the replay a complete no-op.
      Removal.removalMicroBatch(spark, Seq(5L).toDF("doc_id"), 1L,
        intact, s"$tmp/fp", s"$tmp/span")
      assert(sortedRows(spark.read.parquet(s"$tmp/span"))
        .sameElements(spanFinal),
        "replayed micro-batch must not double-subtract gram counts")
      assert(sortedRows(spark.read.parquet(s"$tmp/fp"))
        .sameElements(fpFinal))
      // a genuinely NEW batch still applies after the replay
      Removal.removalMicroBatch(spark, Seq(4L).toDF("doc_id"), 2L,
        intact, s"$tmp/fp", s"$tmp/span")
      val rem2 = intact.where(!col("doc_id").isin(2L, 5L, 4L))
      assert(sortedRows(spark.read.parquet(s"$tmp/span")).sameElements(
        sortedRows(SpanDedup.spanGramIndex(spark, rem2))))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("M6: vector-side artifacts maintained == rebuilt (removal reads no survivor text or embedding)") {
    import graft.operators.Chunking
    val intact = docs
    val remaining = intact.where(!col("doc_id").isin(removeSet: _*))
    val removeIds = Seq(2L, 5L).toDF("doc_id")

    // doc-keyed artifacts: anti-join maintenance touches no text
    val band1 = Dedup.bandsOf(spark, intact)
      .join(removeIds, Seq("doc_id"), "left_anti")
    assert(sortedRows(band1).sameElements(
      sortedRows(Dedup.bandsOf(spark, remaining))))
    val chunk1 = Chunking.cdcChunks(intact).select("doc_id", "sig", "ctok")
      .join(removeIds, Seq("doc_id"), "left_anti")
    assert(sortedRows(chunk1).sameElements(
      sortedRows(Chunking.cdcChunks(remaining).select("doc_id", "sig", "ctok"))))

    // O5: removal-only delta through maintainAssignments must read NO
    // embedding — the frame handed to maintenance is fully poisoned
    val emb = Seq(
      (1L, Seq(1.0, 0.1)), (2L, Seq(0.9, 0.2)), (3L, Seq(0.1, 1.0)),
      (4L, Seq(-0.3, 0.8)), (5L, Seq(0.5, 0.5))).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
      .toDF("cid", "c_emb")
    val ivf0 = SemanticDedup.assignTo(spark, emb, cents)
      .select("vec_id", "embedding", "cid", "cent_sim")
    val poisonedEmb = emb.withColumn("embedding",
      org.apache.spark.sql.functions.array(lit(9e9), lit(-9e9)))
    val removeVecs = Seq(2L, 5L).toDF("vec_id")
    val ivf1 = SemanticDedup.maintainAssignments(spark, ivf0, poisonedEmb,
      removeVecs.select(col("vec_id"), lit("removed").as("change")), cents)
    val rebuilt = SemanticDedup.assignTo(spark,
      emb.where(!col("vec_id").isin(2L, 5L)), cents)
      .select("vec_id", "embedding", "cid", "cent_sim")
    assert(sortedRows(ivf1).sameElements(sortedRows(rebuilt)))
  }

  test("D7: layout removal rewrites only touched cid buckets (untouched bucket's files corrupted)") {
    val emb = Seq(
      (1L, Seq(1.0, 0.1)), (2L, Seq(0.9, 0.2)), (3L, Seq(0.1, 1.0)),
      (4L, Seq(-0.3, 0.8)), (5L, Seq(0.8, 0.3))).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
      .toDF("cid", "c_emb")
    val assigned = SemanticDedup.assignTo(spark, emb, cents)
      .select("vec_id", "embedding", "cid")
    val tmp = java.nio.file.Files.createTempDirectory("graft_d7").toString
    try {
      assigned.write.partitionBy("cid").parquet(s"$tmp/ivf")
      // vecs 1/2/5 land in cid=0, vecs 3/4 in cid=1 (by construction)
      assert(sortedRows(spark.read.parquet(s"$tmp/ivf/cid=0")
        .select("vec_id")).map(_.head).toSeq == Seq(1L, 2L, 5L))
      // corrupt the cid=1 bucket's data files: if removal opens them,
      // it throws — partition-grain removal must never read an
      // untouched bucket
      new java.io.File(s"$tmp/ivf/cid=1").listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          java.nio.file.Files.write(f.toPath,
            "NOT A PARQUET FILE".getBytes)
        }
      Removal.removeFromIvfLayout(spark, s"$tmp/ivf",
        assigned.select("vec_id", "cid"), Seq(2L).toDF("vec_id"), 0L)
      assert(sortedRows(spark.read.parquet(s"$tmp/ivf/cid=0")
        .select("vec_id")).map(_.head).toSeq == Seq(1L, 5L))
      // replay of the same batch: no-op (the bucket's applied marker)
      Removal.removeFromIvfLayout(spark, s"$tmp/ivf",
        assigned.select("vec_id", "cid"), Seq(2L).toDF("vec_id"), 0L)
      assert(sortedRows(spark.read.parquet(s"$tmp/ivf/cid=0")
        .select("vec_id")).map(_.head).toSeq == Seq(1L, 5L))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("corpus + artifacts move as one unit; crash windows recover; re-delivery is a no-op") {
    import graft.sources.ArtifactStore
    val intact = docs
    val remaining = intact.where(!col("doc_id").isin(removeSet: _*))
    val tmp = java.nio.file.Files.createTempDirectory("graft_rma").toString
    try {
      intact.write.parquet(s"$tmp/corpus")
      Winnowing.fpValuesFrom(spark, intact).write.parquet(s"$tmp/fp")
      SpanDedup.spanGramIndex(spark, intact).write.parquet(s"$tmp/span")

      // batch 0 removes doc 2; simulate a crash INSIDE the corpus
      // swap window afterwards: dir renamed away, tmp left behind
      Removal.removalMicroBatchAll(spark, Seq(2L).toDF("doc_id"), 0L,
        s"$tmp/corpus", s"$tmp/fp", s"$tmp/span")
      val afterB0 = sortedRows(spark.read.parquet(s"$tmp/corpus"))
      val fs = new java.io.File(s"$tmp/corpus")
      assert(fs.renameTo(new java.io.File(s"$tmp/corpus.old")))
      // recovery restores the pre-crash state; the batch re-delivery
      // (at-least-once) then finds everything already applied
      Removal.removalMicroBatchAll(spark, Seq(2L).toDF("doc_id"), 0L,
        s"$tmp/corpus", s"$tmp/fp", s"$tmp/span")
      assert(sortedRows(spark.read.parquet(s"$tmp/corpus"))
        .sameElements(afterB0))

      // batch 1 removes doc 5 — corpus, fp and span all advance
      Removal.removalMicroBatchAll(spark, Seq(5L).toDF("doc_id"), 1L,
        s"$tmp/corpus", s"$tmp/fp", s"$tmp/span")
      assert(sortedRows(spark.read.parquet(s"$tmp/corpus")).sameElements(
        sortedRows(remaining)))
      assert(sortedRows(spark.read.parquet(s"$tmp/fp")).sameElements(
        sortedRows(Winnowing.fpValuesFrom(spark, remaining))))
      assert(sortedRows(spark.read.parquet(s"$tmp/span")).sameElements(
        sortedRows(SpanDedup.spanGramIndex(spark, remaining))))
      assert(ArtifactStore.appliedBatch(spark, s"$tmp/corpus") == 1L)

      // re-delivering batch 1 AFTER the corpus dropped doc 5's text
      // must be a no-op everywhere (the span maintainer would find no
      // text — the gate must stop it first)
      Removal.removalMicroBatchAll(spark, Seq(5L).toDF("doc_id"), 1L,
        s"$tmp/corpus", s"$tmp/fp", s"$tmp/span")
      assert(sortedRows(spark.read.parquet(s"$tmp/span")).sameElements(
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

  // --------------------------------------------------------------- M11
  // corpus with probe-vocabulary hits so the postings are non-trivial:
  // docs 2 and 4 are the removal set, and each carries terms NO
  // survivor has (window/agg/batch; hash/table/scan) — their df must
  // fall to 0 and LEAVE the term-stats artifact, exactly as a rebuild
  // drops them
  private def bmDocs = Seq(
    (1L, "spark join filter and more data words here"),
    (2L, "window agg batch data spark spark"),
    (3L, "customer order line query join spark"),
    (4L, "hash table scan scan scan"),
    (5L, "nothing from the probe vocabulary at all")).toDF("doc_id", "text")

  test("M11: BM25 serving state maintained == rebuilt (survivor text poisoned; df-to-zero terms leave)") {
    import graft.operators.Retrieval
    val removeIds = Seq(2L, 4L).toDF("doc_id")
    val remaining = bmDocs.where(!col("doc_id").isin(2L, 4L))

    val post0 = Retrieval.bm25Postings(bmDocs)
    val term0 = Retrieval.bm25TermStats(post0)
    val corp0 = Retrieval.bm25CorpusStats(bmDocs)
    // survivors' text corrupted in the frame maintenance drinks from:
    // a removal serves the REMOVED docs' text from the corpus (corpus
    // stats subtract their token mass) but must never re-read what it
    // isn't removing
    val poisoned = bmDocs.withColumn("text",
      when(col("doc_id").isin(2L, 4L), col("text"))
        .otherwise(lit("POISON")))
    val (post1, term1, corp1) = Retrieval.maintainBm25Removal(
      post0, term0, corp0,
      poisoned.join(removeIds, Seq("doc_id"), "left_semi"))

    assert(sortedRows(post1).sameElements(
      sortedRows(Retrieval.bm25Postings(remaining))))
    assert(sortedRows(term1).sameElements(
      sortedRows(Retrieval.bm25TermStats(Retrieval.bm25Postings(remaining)))))
    assert(sortedRows(corp1).sameElements(
      sortedRows(Retrieval.bm25CorpusStats(remaining))))
    // the df-to-zero terms are GONE, not present with df=0
    val terms1 = term1.select("term").collect().map(_.getString(0)).toSet
    for (t <- Seq("window", "agg", "batch", "hash", "table", "scan"))
      assert(!terms1.contains(t), s"df-0 term '$t' still in term stats")
    // shared terms survive with the survivors' df
    assert(terms1.contains("spark") && terms1.contains("join"))
  }

  test("M11: packed BQ index maintained == rebuilt; v3 audit is zero-residue with poisoned survivors") {
    import graft.operators.Retrieval
    val emb = (1L to 6L).map(i =>
      (i, Seq.tabulate(64)(j => if ((i + j) % 3 == 0) -1.0 else 1.0)))
      .toDF("vec_id", "embedding")
    val removeVecs = Seq(2L, 5L).toDF("vec_id")
    def packOf(e: DataFrame) = e.select(col("vec_id"),
      graft.functions.Vectors.bitpackFast(spark, col("embedding"))
        .as("words"))
    val bq1 = packOf(emb).join(removeVecs, Seq("vec_id"), "left_anti")
    assert(sortedRows(bq1).sameElements(
      sortedRows(packOf(emb.where(!col("vec_id").isin(2L, 5L))))))

    // the composed audit over poisoned survivors: four artifact rows,
    // zero residue everywhere, checksums equal to a from-scratch
    // audit on the remaining corpus with an empty removal set
    val removeIds = Seq(2L, 4L).toDF("doc_id")
    val poisoned = bmDocs.withColumn("text",
      when(col("doc_id").isin(2L, 4L), col("text"))
        .otherwise(lit("POISON")))
    val post0 = Retrieval.bm25Postings(bmDocs)
    val audit = Removal.removalAuditV3With(spark, post0,
      Retrieval.bm25TermStats(post0),
      Retrieval.bm25CorpusStats(bmDocs),
      packOf(emb), poisoned, removeIds, removeVecs).collect()
    assert(audit.map(_.getString(0)).toSeq == Seq("bm25_corpus_stats",
      "bm25_postings", "bm25_term_stats", "bq_packed_index"))
    assert(audit.forall(_.getAs[Long]("n_residue") == 0L))
    val remaining = bmDocs.where(!col("doc_id").isin(2L, 4L))
    val post0r = Retrieval.bm25Postings(remaining)
    val rebuilt = Removal.removalAuditV3With(spark, post0r,
      Retrieval.bm25TermStats(post0r),
      Retrieval.bm25CorpusStats(remaining),
      packOf(emb.where(!col("vec_id").isin(2L, 5L))),
      remaining, Seq.empty[Long].toDF("doc_id"),
      Seq.empty[Long].toDF("vec_id")).collect()
    assert(audit.map(_.toSeq.toList).toSeq ==
      rebuilt.map(_.toSeq.toList).toSeq)
  }
}
