package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Regenerates the checked-in golden files for the rows-only queries
  * (D3/D5/D6 ANN + H7 sketch profile) on the sf0.001 test fixture.
  * Training is deterministic by construction (md5 sample order, fixed
  * iteration counts, smallest-id tie-breaks), so the exact output is
  * pinnable — run this ONLY after an intentional algorithm change, and
  * say so in the commit message:
  *
  *   sbt "Test/runMain graft.GoldenGen"
  */
object GoldenGen {
  val Dir = "src/test/resources/golden"
  val SfDir = "/root/testdata/sf0.001"

  /** (name, query, stringify-row) — scores rounded to 6 dp so the
    * golden pins ranking + ids, not last-bit float noise. */
  def cases(spark: SparkSession): Seq[(String, DataFrame)] = Seq(
    "q_ann_ivf_trained" -> SparkEntry.queries("q_ann_ivf_trained")(spark, SfDir),
    "q_ann_pq" -> SparkEntry.queries("q_ann_pq")(spark, SfDir),
    "q_ann_ivfpq" -> SparkEntry.queries("q_ann_ivfpq")(spark, SfDir))

  def annCsv(df: DataFrame): Seq[String] =
    df.select(col("query_id"), col("rank"), col("vec_id"),
      format_string("%.6f", col("cos_sim")).as("cos6"))
      .orderBy("query_id", "rank")
      .collect().map(r => s"${r.get(0)},${r.get(1)},${r.get(2)},${r.get(3)}").toSeq

  def semCsv(df: DataFrame): Seq[String] =
    df.select(col("vec_id"), col("cid"),
      format_string("%.6f", col("cent_sim")).as("cs6"), col("keep"))
      .orderBy("vec_id")
      .collect().map(r => s"${r.get(0)},${r.get(1)},${r.get(2)},${r.get(3)}").toSeq

  def profileCsv(df: DataFrame): Seq[String] =
    df.select(col("event_type"), col("n_events"), col("approx_users"),
      format_string("%.6f", col("p50_value")).as("p50"),
      format_string("%.6f", col("p99_value")).as("p99"))
      .orderBy("event_type")
      .collect().map(r =>
        s"${r.get(0)},${r.get(1)},${r.get(2)},${r.get(3)},${r.get(4)}").toSeq

  private def write(name: String, lines: Seq[String]): Unit = {
    new File(Dir).mkdirs()
    val pw = new PrintWriter(new File(s"$Dir/$name.csv"))
    try lines.foreach(pw.println) finally pw.close()
    println(s"[golden] wrote $Dir/$name.csv (${lines.size} rows)")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      cases(spark).foreach { case (n, df) => write(n, annCsv(df)) }
      write("q_profile_approx",
        profileCsv(SparkEntry.queries("q_profile_approx")(spark, SfDir)))
      write("q_dedup_semantic",
        semCsv(SparkEntry.queries("q_dedup_semantic")(spark, SfDir)))
    } finally spark.stop()
  }
}
