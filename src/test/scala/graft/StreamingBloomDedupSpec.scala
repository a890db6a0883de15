package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.sources.Tables
import graft.streaming.BloomDedupState

/** Q1 gates: the bounded-bloom streaming dedup emits exactly one doc
  * per C1 signature, remembers signatures ACROSS restarts through the
  * checkpoint (a re-delivered corpus emits nothing), and its state is
  * provably constant-size in keys seen — the property that makes it
  * the 100 TB form of stateful dropDuplicates. */
class StreamingBloomDedupSpec extends SparkSpec {

  test("bloom dedup emits one doc per signature and drops re-deliveries across restarts") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bloomdedup").toFile.getPath
    try {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      // batch 1: the corpus + planted exact dups (token-shuffle-free
      // copies under fresh ids — same bag signature by construction)
      val planted = docs.limit(5)
        .select((col("doc_id") + 800000L).as("doc_id"), col("text"))
      docs.unionByName(planted)
        .write.mode("overwrite").parquet(s"$tmp/in/b1")

      // parquet sink (the memory sink cannot recover from a
      // checkpoint, and checkpoint recovery IS what's under test)
      def runOnce(): Seq[(Long, String)] = {
        val stream = spark.readStream
          .schema("doc_id BIGINT, text STRING").parquet(s"$tmp/in/*")
        val q = BloomDedupState.dedupStream(stream, shards = 8)
          .toDF("doc_id", "sig")
          .writeStream.format("parquet")
          .option("path", s"$tmp/out")
          .option("checkpointLocation", s"$tmp/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.read.parquet(s"$tmp/out").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
      }

      val run1 = runOnce()
      val wantSigs = Dedup.exactFrom(docs).select("sig").distinct()
        .collect().map(_.getString(0)).toSet
      assert(run1.map(_._2).toSet == wantSigs,
        s"emitted signature set diverged: ${run1.size} rows vs ${wantSigs.size} sigs")
      assert(run1.map(_._2).distinct.size == run1.size,
        "a signature was emitted twice in one run")
      // the planted dups' sigs were already in the corpus — none of
      // the planted ids may surface
      assert(!run1.exists(_._1 >= 800000L), "a planted exact dup was emitted")

      // batch 2: the WHOLE corpus re-delivered under fresh ids, after
      // a query restart — the checkpointed bloom state must drop all
      docs.select((col("doc_id") + 900000L).as("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$tmp/in/b2")
      val run2 = runOnce() // cumulative sink contents
      val leaked = run2.map(_._1).toSet -- run1.map(_._1).toSet
      assert(leaked.isEmpty,
        s"${leaked.size} re-delivered docs leaked past the restored bloom state")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("state is constant-size in keys seen (the bound that replaces per-key rows)") {
    val empty = BloomDedupState.stateBytes()
    val bf = org.apache.spark.util.sketch.BloomFilter
      .create(BloomDedupState.DefaultExpected, BloomDedupState.DefaultFpp)
    (1 to 10000).foreach(i => bf.putString(s"sig-$i"))
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    assert(out.toByteArray.length == empty,
      s"bloom state grew: ${out.toByteArray.length} vs $empty after 10k inserts")
    // and the bound is small: 64 default shards fit comfortably in an
    // executor (~1.2 MiB each at 1M keys / 1% fp)
    assert(empty < 2 * 1024 * 1024, s"per-shard state unexpectedly large: $empty")
  }
}
