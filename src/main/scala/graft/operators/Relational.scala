package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Relational core: the query-engine capabilities underneath the
  * reference's event operators (scan/filter/agg/join/window/...).
  *
  * Correctness conventions shared with the DuckDB oracle:
  *   - double measures are aggregated through DECIMAL (exact and
  *     order-independent, so parallel aggregation order can't change
  *     the result) and cast back to double at the end;
  *   - every output column is aliased identically on both sides;
  *   - a total ORDER BY on a unique key keeps row order identical.
  *
  * Scale notes: dimension tables at TPC-H ratios (region, nation,
  * supplier, customer, part) stay broadcast-size even at 100 TB
  * lineitem; fact-side joins shuffle on the join key and rely on AQE
  * for skew/coalesce. Aggregations are partial (map-side combine) by
  * construction since all aggregates here are algebraic.
  */
object Relational {

  private val D = DecimalType(18, 2)

  /** B1: pricing summary (TPC-H Q1 shape). One scan, one shuffle. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(D)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast(D) * (lit(1).cast(D) - col("l_discount").cast(D)))
          .cast(DecimalType(38, 4))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
