package graft

import graft.operators.{OracleContext, Pipeline, SemanticDedup}

/** Pins the dump-order independence of trained-model oracle literals.
  *
  * The round-14 regression this guards: a dump-only
  * [[graft.operators.OracleModelCache]] fallback can NEST into another
  * operator's trainer (Pipeline.dropCache → semanticDedup →
  * semCentCache) and retrain/trample that cache between a query's run
  * and its own oracle dump. With [[OracleContext]] pinned to the run's
  * dir (what Verify/Bench do at startup), every nested retrain lands
  * on the same data and within-session retraining is bit-stable — so
  * the embedded literal cannot depend on the map-evaluation order. */
class OracleContextSpec extends SparkSpec {

  test("a nested dump-only fallback cannot change an embedded model literal") {
    OracleContext.dir.set(sfDir)
    try {
      // the query runs first (trains + caches the I4 centroids)
      SparkEntry.queries("q_dedup_semantic")(spark, sfDir).count()
      val before = SemanticDedup.semanticDedupSql
      // an UNRELATED oracle's dump-only fallback nests into the same
      // trainer (this is what evaluating the full oracleSql map does
      // when q_pipeline_pack didn't run)
      assert(Pipeline.oracleDropIds.nonEmpty)
      val after = SemanticDedup.semanticDedupSql
      assert(before == after,
        "dump-order trample: a nested fallback changed the I4 literal")
    } finally OracleContext.dir.set(null)
  }
}
