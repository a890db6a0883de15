package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.ImageMeta

/** F1: binary column + metadata + per-partition decode pipeline. */
class MultimodalSpec extends SparkSpec {

  test("media table carries real binary payloads with metadata") {
    val m = Multimodal.mediaTable(spark, sfDir)
    val r = m.head()
    assert(r.payload.nonEmpty && r.n_bytes == r.payload.length)
    assert(r.mime == "image/png" || r.mime == "image/jpeg")
  }

  test("PNG header parse reads back big-endian IHDR dimensions") {
    // hand-built PNG: magic + IHDR with width 640, height 480
    val p = hexBytes("89504E470D0A1A0A0000000D49484452" +
      "00000280" + "000001E0" + "0802000000") ++ "content".getBytes("UTF-8")
    assert(Multimodal.parseImageMeta(p) ==
      Some(ImageMeta("image/png", 640, 480, 29)))
  }

  test("JPEG segment walk skips APPn/COM segments to find SOF") {
    // SOI + APP0(JFIF) + COM segment + SOF2 (progressive) w=123 h=45
    val com = "FFFE0007" + "68656C6C6F" // 5-byte comment, len 7
    val p = hexBytes("FFD8" + "FFE000104A46494600010100000100010000" +
      com + "FFC2001108" + "002D" + "007B" + "03011100021101031101") ++
      Array[Byte](1, 2, 3)
    val m = Multimodal.parseImageMeta(p)
    assert(m.exists(x => x.mime == "image/jpeg" && x.width == 123 && x.height == 45))
    // content offset = everything before the trailing 3 bytes
    assert(m.get.contentAt == p.length - 3)
  }

  test("malformed payloads degrade to octet-stream, never throw") {
    assert(Multimodal.parseImageMeta(Array[Byte]()).isEmpty)
    assert(Multimodal.parseImageMeta("not an image".getBytes("UTF-8")).isEmpty)
    // JPEG SOI but truncated before any SOF
    assert(Multimodal.parseImageMeta(hexBytes("FFD8FFE00004")).isEmpty)
    // PNG magic but corrupted IHDR tag
    assert(Multimodal.parseImageMeta(hexBytes(
      "89504E470D0A1A0A0000000D58585858" + "00000001" + "00000001" + "0802000000")).isEmpty)
  }

  test("decode pipeline is deterministic, 1:1, and parses every wrapped payload") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() == media.count())
    // deterministic across runs / partitionings
    val a = feats.orderBy("doc_id").collect()
    val b = Multimodal.decodeFeatures(media.repartition(7)).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    // every wrapped payload parses: dims in 1..256, mime sniffed (not
    // the declared column), fp8 = md5 prefix of the embedded content
    assert(a.forall(f => f.width >= 1 && f.width <= 256 &&
      f.height >= 1 && f.height <= 256 && f.fp8.length == 8 &&
      (f.mime == "image/png" || f.mime == "image/jpeg")))
  }

  private def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
}
