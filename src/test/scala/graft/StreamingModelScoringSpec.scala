package graft

import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Bpe, QualityClassifier}
import graft.sources.Tables

/** The P1/P2 scoring passes claim to be stream-safe (narrow,
  * stateless, frozen-model) — this pins it through a REAL stream:
  * scoring a document stream under frozen models emits exactly the
  * batch frame, in any output mode, with no state store (the M3/O7
  * frozen-artifact convention). */
class StreamingModelScoringSpec extends SparkSpec {

  private def streamed(build: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] = {
    val tmp = java.nio.file.Files.createTempDirectory("mscore").toFile.getPath
    try {
      Tables.documents(spark, sfDir)
        .write.mode("overwrite").parquet(s"$tmp/docs")
      val name = "ms_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = build(spark.readStream.schema(Tables.documentsSchema)
        .parquet(s"$tmp/docs"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).collect().toSeq
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("frozen-weights classifier scoring over a real stream equals the batch frame") {
    val m = QualityClassifier.model(spark, sfDir)
    val got = streamed(s => QualityClassifier.classifyFrom(s, m))
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val want = QualityClassifier
      .classifyFrom(Tables.documents(spark, sfDir), m).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(got == want, s"${(got diff want).size} extra, ${(want diff got).size} missing")
  }

  test("frozen-vocab BPE scoring over a real stream equals the batch frame") {
    val m = Bpe.model(spark, sfDir)
    val got = streamed(s => Bpe.tokenCountsBpeFrom(spark, s, m))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Bpe
      .tokenCountsBpeFrom(spark, Tables.documents(spark, sfDir), m).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"${(got diff want).size} extra, ${(want diff got).size} missing")
  }
}
