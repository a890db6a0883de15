package graft.operators

/** Pins the r15 ADVICE finding on [[OracleModelCache.oracleModel]]'s
  * fallback order: [[OracleContext.dir]] (the run's pinned data dir)
  * must outrank the cache's own `lastDir` — the documented precedence
  * the code contradicted. With lastDir winning, a multi-dir session
  * (sf0.001 spec run, then an sf0.01 dump) embeds the STALE dir's
  * model in the oracle SQL. In-package because the cache is
  * `private[operators]` by design. */
class OracleCachePrecedenceSpec extends graft.SparkSpec {

  test("OracleContext.dir outranks the cache's own lastDir") {
    val cache = new OracleModelCache[String]((_, dir) => s"model:$dir")
    cache.model(spark, "/tmp/graft_dirB") // records lastDir = dirB
    OracleContext.dir.set("/tmp/graft_dirA")
    try assert(cache.oracleModel() == "model:/tmp/graft_dirA")
    finally OracleContext.dir.set(null)
  }

  test("without a pinned context the cache still serves its last-trained model") {
    val prev = OracleContext.dir.get()
    OracleContext.dir.set(null)
    try {
      val cache = new OracleModelCache[String]((_, dir) => s"model:$dir")
      cache.model(spark, "/tmp/graft_dirC")
      assert(cache.oracleModel() == "model:/tmp/graft_dirC")
    } finally OracleContext.dir.set(prev)
  }
}
