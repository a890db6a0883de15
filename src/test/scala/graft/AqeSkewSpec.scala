package graft

import org.apache.spark.sql.functions._

/** Proves the claimed AQE skew-join path actually fires (SURVEY §5
  * "Joins"): the production contract for fact-fact joins is salting
  * for KNOWN hot keys plus AQE's OptimizeSkewedJoin as the backstop
  * for residual / unforeseen skew. local[32] never reaches the
  * default 256 MB skew threshold, so this test scales the thresholds
  * down (the decision logic — partition > factor × median AND >
  * threshold — is identical at any byte scale) and asserts the
  * executed adaptive plan really split the planted hot partition,
  * rather than trusting the config flag.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a planted skewed partition in a fact-fact sort-merge join") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // same decision rule as production, scaled to fixture bytes
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k",
      // both sides are facts: force the sort-merge path
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 99% of fact rows share key 0 — the residual-skew shape salting
      // missed. The payload column matters: a skewed partition of
      // constant keys alone lz4-compresses below any byte threshold in
      // the shuffle stats, hiding the skew from the detector — real
      // fact rows carry incompressible bytes, so the fixture must too
      val fact = spark.range(200000).select(
        when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id") % 1000).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(5000).select((col("id") % 1000).as("k"),
        col("id").as("v2"))
      // the payload must survive column pruning to reach the shuffle —
      // aggregate over it too
      val q = fact.join(dim, "k").groupBy()
        .agg(sum("v2").as("s"), max("payload").as("p"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin never fired on a 99%-hot key:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
