package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Generic as-of join (G5) — the point-in-time join Spark lacks as a
  * built-in: for each left row, the most recent right row with
  * right.ts <= left.ts within the same key.
  *
  * Shape (SURVEY §5): NO point-in-time cross join. Both sides union
  * into one stream, one shuffle+sort on (key, ts), and a running
  * last-non-null window fills each probe row with its match — linear
  * in |left|+|right| at any scale, the same technique as the
  * reference's B-tree seek (timestamp2offset.go:60-80) expressed as a
  * sort-merge.
  */
object AsofJoin {

  /** `left` columns plus `payload` columns from the matched right row
    * (null when no earlier right row exists). `key` and `ts` name
    * columns present in BOTH inputs; right-side ties on ts resolve to
    * the last row in (ts, tiebreak) order. */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String], tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // the matched row's payload travels as ONE struct: last(_, ignoreNulls)
    // then selects the whole matched row atomically, so a NULL inside a
    // matched row's payload is preserved rather than skipped in favor of
    // a stale older row's value
    val payloadStruct = struct(payload.map(col): _*)
    val l = left
      .withColumn("__probe", lit(1))
      .withColumn("__tb", lit(Long.MaxValue))
      .withColumn("__p", lit(null).cast(
        org.apache.spark.sql.types.StructType(payload.map(c => right.schema(c)))))
    val r = leftCols.filterNot(Set(key, ts)).foldLeft(
      right
        .withColumn("__probe", lit(0))
        .withColumn("__tb", col(tiebreak).cast("long"))
        .withColumn("__p", payloadStruct))(
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = (leftCols ++ Seq("__probe", "__tb", "__p")).map(col)
    val unioned = l.select(cols: _*).unionByName(r.select(cols: _*))
    // right rows sort before the probe at equal ts (__probe 0 < 1), so
    // "<=" matches; among right ties the largest tiebreak wins
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__probe"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__probe") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }

  /** Attribution query: for each purchase, the user's latest click at
    * or before it — the canonical event-pipeline as-of use. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsRaw(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("us"),
        col("event_type"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    // collapse same-instant clicks to the max event_id BEFORE the asof:
    // DuckDB's ASOF JOIN has no tiebreak among equal-ts rows, so unique
    // (user, ts) keys on the right are what keeps both engines aligned
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("us"))
      .agg(max("event_id").as("click_id"))
      .select(col("user_id"), col("us"), col("click_id"), col("us").as("click_us"))
    backward(purchases, clicks, key = "user_id", ts = "us",
      payload = Seq("click_id", "click_us"), tiebreak = "click_id")
      .orderBy("event_id")
  }

  val attributionSql: String =
    """SELECT p.event_id, p.user_id, p.us, c.click_id AS asof_click_id,
      |  c.click_us AS asof_click_us
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN
      |     (SELECT user_id, epoch_us(ts) AS us, max(event_id) AS click_id,
      |             epoch_us(ts) AS click_us FROM events
      |      WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)) c
      |  ON p.user_id = c.user_id AND p.us >= c.us
      |ORDER BY p.event_id""".stripMargin
}
