package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{RuleFilters, Sampling}
import graft.sources.Tables

/** V4: the stateless rule filters (V1 Gopher, V2 C4, W1 Pareto) as
  * streaming ingest gates — each arriving document leaves with its
  * verdicts in-flight, before it ever lands in the corpus. The
  * streaming form IS the batch column set (sort-free `*Verdicts`), so
  * the only thing to pin is that the micro-batch engine produces the
  * identical rows — no divergence is constructible, and this spec
  * keeps it that way. */
class StreamingRuleGateSpec extends SparkSpec {

  private def withDocsDir[A](body: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gate").toString
    try {
      Tables.documents(spark, sfDir).write.parquet(s"$tmp/docs")
      body(s"$tmp/docs")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  private def streamed(dir: String, name: String,
                       gate: DataFrame => DataFrame): DataFrame = {
    val q = gate(graft.streaming.DocStreams.readDocs(spark, dir))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  private def pinEqual(name: String, gate: DataFrame => DataFrame,
                       batch: DataFrame): Unit = withDocsDir { dir =>
    val got = streamed(dir, name + System.nanoTime(), gate)
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      s"stream and batch $name verdicts diverge")
  }

  test("streaming gopher gate equals the batch verdicts row-for-row") {
    pinEqual("gate_gopher_", RuleFilters.gopherVerdicts,
      RuleFilters.gopherRulesFrom(Tables.documents(spark, sfDir)))
  }

  test("streaming c4 gate equals the batch transform hash-for-hash") {
    pinEqual("gate_c4_", RuleFilters.c4Verdicts,
      RuleFilters.c4CleanFrom(Tables.documents(spark, sfDir)))
  }

  test("streaming pareto gate keeps exactly the batch-kept documents") {
    pinEqual("gate_pareto_", Sampling.paretoVerdicts,
      Sampling.paretoSampleFrom(Tables.documents(spark, sfDir)))
  }

  test("streaming fineweb gate equals the batch verdicts row-for-row (Z4)") {
    pinEqual("gate_fineweb_", RuleFilters.fineWebVerdicts,
      RuleFilters.fineWebFiltersFrom(Tables.documents(spark, sfDir)))
  }
}
