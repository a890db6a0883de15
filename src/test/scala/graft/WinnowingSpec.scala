package graft

import org.apache.spark.sql.functions._

import graft.operators.Winnowing

/** Pins the two published winnowing guarantees (Schleimer et al. 2003)
  * on planted fixtures, plus the no-false-positive floor. */
class WinnowingSpec extends SparkSpec {

  import spark.implicits._

  private def fps(docs: Seq[(Long, String)]) =
    Winnowing.fingerprintsFrom(spark, docs.toDF("doc_id", "text"))

  test("guarantee: a shared run of >= W+K-1 tokens always yields a shared fingerprint") {
    // the shared run is exactly GuaranteeTokens long and sits inside
    // otherwise-disjoint token streams; try several embeddings so the
    // window phase can't accidentally align
    val run = (1 to Winnowing.GuaranteeTokens).map(i => s"shared$i").mkString(" ")
    for (pad <- 0 to 4) {
      val a = ((1 to 9).map(i => s"alpha$i") :+ run).mkString(" ")
      val b = (((1 to (9 + pad)).map(i => s"beta$i") :+ run) ++
        (1 to 5).map(i => s"gamma$i")).mkString(" ")
      val shared = Winnowing.winnowPairsFrom(
        spark, Seq((1L, a), (2L, b)).toDF("doc_id", "text")).collect()
      assert(shared.length == 1 && shared.head.getAs[Long]("n_shared_fp") >= 1,
        s"guarantee broken at pad=$pad: no shared fingerprint for a " +
          s"${Winnowing.GuaranteeTokens}-token shared run")
    }
  }

  test("no shared K-gram -> no shared fingerprint (no false positives)") {
    val a = (1 to 20).map(i => s"left$i").mkString(" ")
    val b = (1 to 20).map(i => s"right$i").mkString(" ")
    val pairs = Winnowing.winnowPairsFrom(
      spark, Seq((1L, a), (2L, b)).toDF("doc_id", "text")).count()
    assert(pairs == 0)
  }

  test("density: fingerprints per doc are bounded by the windows and floored by W") {
    val text = (1 to 60).map(i => s"tok$i").mkString(" ")
    val n = fps(Seq((1L, text))).count()
    val grams = 60 - Winnowing.K + 1
    val windows = grams - Winnowing.W + 1
    assert(n <= windows, s"more fingerprints ($n) than windows ($windows)")
    // a selection survives at most W consecutive windows
    assert(n >= windows / Winnowing.W,
      s"fewer fingerprints ($n) than the 1-per-W floor (${windows / Winnowing.W})")
  }

  test("rightmost-minimum tie rule: identical hashes in one window pick the later position") {
    // a run of IDENTICAL tokens makes every gram (and hash) in the
    // window equal — the selected pos must be the window's last slot
    val text = (1 to 10).map(_ => "same").mkString(" ")
    val rows = fps(Seq((1L, text))).orderBy("pos").collect()
    // all grams identical -> one fp value; rightmost rule re-selects a
    // NEW (later) position each time the window slides past the last
    // selection, so positions are W apart starting at slot W
    val positions = rows.map(_.getAs[Long]("pos")).toSeq
    assert(rows.map(_.getAs[String]("fp")).distinct.length == 1)
    assert(positions.head == Winnowing.W,
      s"first selection not at the window's rightmost slot: $positions")
  }
}
