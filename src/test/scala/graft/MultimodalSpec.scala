package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** F1: binary column + metadata + per-partition decode pipeline. */
class MultimodalSpec extends SparkSpec {

  test("media table carries real binary payloads with metadata") {
    val m = Multimodal.mediaTable(spark, sfDir)
    val r = m.head()
    assert(r.payload.nonEmpty && r.n_bytes == r.payload.length)
    assert(r.mime == "text/plain")
  }

  test("decode pipeline is deterministic and 1:1") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() == media.count())
    // deterministic across runs / partitionings
    val a = feats.orderBy("doc_id").collect()
    val b = Multimodal.decodeFeatures(media.repartition(7)).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.forall(f => f.width >= 1 && f.width <= 16 && f.fp8.length == 8))
  }
}
