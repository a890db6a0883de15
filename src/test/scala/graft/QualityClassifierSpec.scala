package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityClassifier, TextAnalysis}
import graft.sources.Tables

/** P2 gates: training converges to a model that reproduces its weak
  * labels well, and — the point of LEARNING the gate — the classifier
  * separates planted gibberish from clean prose where the E2 teacher
  * itself fails (E2 rewards type diversity, so random-character text
  * outscores prose; the classifier keys on word identity and drops
  * gibberish to the untrained-bucket floor). */
class QualityClassifierSpec extends SparkSpec {

  private def auc(pos: Seq[Double], neg: Seq[Double]): Double = {
    val pairs = for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    pairs.sum / pairs.length
  }

  private lazy val model = QualityClassifier.model(spark, sfDir)

  test("training separates its own confident label bands") {
    val scored = QualityClassifier.classify(spark, sfDir)
      .join(TextAnalysis.quality(spark, sfDir).select("doc_id", "quality_score"),
        Seq("doc_id"))
      .select(col("qc_score"), col("quality_score")).collect()
    val pos = scored.filter(_.getDouble(1) >= QualityClassifier.BandHi).map(_.getDouble(0))
    val neg = scored.filter(_.getDouble(1) <= QualityClassifier.BandLo).map(_.getDouble(0))
    assert(pos.nonEmpty && neg.nonEmpty, "fixture lacks both label bands")
    val a = auc(pos.toSeq, neg.toSeq)
    assert(a >= 0.85, f"train-band AUC $a%.3f < 0.85 — training failed to fit")
    assert(model.nTrain > 0 && model.weights.exists(_ != 0.0))
  }

  test("classifier beats the E2 teacher on planted gibberish (held-out AUC gate)") {
    import spark.implicits._
    // held-out: clean prose from the corpus vs random-character
    // gibberish the model never saw (deterministic seed)
    val rnd = new scala.util.Random(11)
    def gibWord() = Seq.fill(6 + rnd.nextInt(3))(
      ('a' + rnd.nextInt(26)).toChar).mkString
    val gibberish = (1 to 40).map(i =>
      (900000L + i, Seq.fill(30)(gibWord()).mkString(" ")))
    val clean = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val mixed = (clean ++ gibberish).toDF("doc_id", "text")

    val qc = QualityClassifier.classifyFrom(mixed, model).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val e2 = mixed.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val cleanIds = clean.map(_._1)
    val gibIds = gibberish.map(_._1)
    val aucQc = auc(cleanIds.map(qc), gibIds.map(qc))
    val aucE2 = auc(cleanIds.map(e2), gibIds.map(e2))
    assert(aucQc >= 0.95,
      f"classifier AUC $aucQc%.3f < 0.95 on clean-vs-gibberish")
    assert(aucQc > aucE2 + 0.2,
      f"classifier ($aucQc%.3f) must clearly beat the E2 teacher " +
        f"($aucE2%.3f) on the failure mode it was built for")
  }

  test("scoring is one narrow pass under frozen weights") {
    val df = QualityClassifier.classifyFrom(
      Tables.documents(spark, sfDir), model)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Generate") &&
      !plan.contains("HashAggregate"),
      s"classifier scoring must be a narrow projection:\n$plan")
  }
}
