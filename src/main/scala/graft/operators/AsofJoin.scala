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
    val l = left
      .withColumn("__probe", lit(1))
      .withColumn("__tb", lit(Long.MaxValue))
    val lAligned = payload.foldLeft(l)((df, c) =>
      df.withColumn(s"__p_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right
      .withColumn("__probe", lit(0))
      .withColumn("__tb", col(tiebreak).cast("long"))
    val rAligned = leftCols.filterNot(Set(key, ts)).foldLeft(
      payload.foldLeft(r)((df, c) => df.withColumn(s"__p_$c", col(c))))(
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = (leftCols ++ Seq("__probe", "__tb") ++ payload.map(c => s"__p_$c")).map(col)
    val unioned = lAligned.select(cols: _*).unionByName(rAligned.select(cols: _*))
    // right rows sort before the probe at equal ts (__probe 0 < 1), so
    // "<=" matches; among right ties the largest tiebreak wins
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__probe"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned)((df, c) =>
      df.withColumn(s"__m_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w)))
    filled.where(col("__probe") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__m_$c").as(s"asof_$c")): _*)
  }

  /** Attribution query: for each purchase, the user's latest click at
    * or before it — the canonical event-pipeline as-of use. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsRaw(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("us"),
        col("event_type"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("event_id").as("click_id"),
        col("us").as("click_us"))
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
      |     (SELECT user_id, epoch_us(ts) AS us, event_id AS click_id,
      |             epoch_us(ts) AS click_us FROM events
      |      WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.us >= c.us
      |ORDER BY p.event_id""".stripMargin
}
