package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main for interactive dev; not part of the contract. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts_us", timestamp_micros(expr("ts DIV 1000")))
      ev.printSchema()
      ev.show(3, truncate = false)
      ev.select(min("ts_us"), max("ts_us"), count(lit(1))).show(truncate = false)
    } catch {
      case e: Throwable => println("READ FAILED: " + e)
    }
    spark.stop()
  }
}
