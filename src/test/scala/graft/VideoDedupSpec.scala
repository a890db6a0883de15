package graft

import graft.operators.{Dedup, VideoDedup}

/** F8/F9 gates: the animated-GIF round trip (multi-frame container,
  * indexed-palette frames) recovers the planted frame-0 fingerprint,
  * frame SAMPLING decodes strictly fewer frames than the container
  * holds (the I/O property that makes video dedup affordable), and
  * the hamming composition equals C3's pair set. */
class VideoDedupSpec extends SparkSpec {

  test("container parse + frame-sampled fingerprint recover the construction exactly") {
    val want = Dedup.simhashSigs(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val blobs = VideoDedup.videoTable(spark, sfDir).collect()
    assert(blobs.length == want.size)
    blobs.foreach { v =>
      val (w, h, n) = VideoDedup.parseGif(v.gif)
        .getOrElse(fail(s"doc ${v.doc_id} unparseable"))
      assert((w, h, n) == (72, 64, VideoDedup.Frames),
        s"doc ${v.doc_id}: ($w,$h,$n)")
      val (hashes, decoded) = VideoDedup
        .sampledHashes(v.gif, VideoDedup.SampleStride).get
      assert(decoded < n,
        s"sampling decoded every frame ($decoded of $n) — no I/O saving")
      assert(hashes.head == want(v.doc_id),
        s"doc ${v.doc_id} frame-0 hash mis-recovered through the GIF codec")
    }
  }

  test("structural metadata walk equals the full ImageIO parse on every clip; garbage is None") {
    // parseGifFast replaces getNumImages(true)'s per-frame decode in
    // videoMeta — it must agree with the full parse bit-for-bit on
    // every rendered container, and keep the unreadable-payload
    // contract on junk
    val blobs = VideoDedup.videoTable(spark, sfDir).collect()
    blobs.foreach { v =>
      assert(VideoDedup.parseGifFast(v.gif) == VideoDedup.parseGif(v.gif),
        s"doc ${v.doc_id}: structural walk diverged from ImageIO")
    }
    assert(VideoDedup.parseGifFast("NOT A GIF AT ALL".getBytes).isEmpty)
    assert(VideoDedup.parseGifFast(Array[Byte]()).isEmpty)
    // truncated container: header valid, stream cut mid-frame
    val cut = blobs.head.gif.take(40)
    assert(VideoDedup.parseGifFast(cut).isEmpty ||
      VideoDedup.parseGifFast(cut) == VideoDedup.parseGif(cut))
  }

  test("stride 1 decodes all frames and later frames differ from frame 0 (a real stream)") {
    val v = VideoDedup.videoTable(spark, sfDir).limit(1).collect().head
    val (hashes, decoded) = VideoDedup.sampledHashes(v.gif, 1).get
    assert(decoded == VideoDedup.Frames && hashes.length == VideoDedup.Frames)
    assert(hashes.distinct.length > 1,
      "every frame hashed identically — the clip is a still, not a stream")
  }

  test("video near-dup pairs equal C3's simhash pairs") {
    val vid = VideoDedup.videoNearDup(spark, sfDir)
    val txt = Dedup.simhash(spark, sfDir)
    assert(vid.exceptAll(txt).isEmpty && txt.exceptAll(vid).isEmpty,
      "video pair set diverged from the text simhash pair set")
    assert(vid.count() > 0)
  }
}
