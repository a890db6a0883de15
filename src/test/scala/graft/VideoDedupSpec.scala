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
    // truncated AT a block boundary (trailer 0x3B stripped): a full
    // frame parsed but no trailer seen — the strict contract is None
    // (the ImageIO path EOFs there), not a shorter clip
    val noTrailer = {
      val g = blobs.head.gif
      assert((g.last & 0xFF) == 0x3B, "rendered GIF must end in trailer")
      g.dropRight(1)
    }
    assert(VideoDedup.parseGifFast(noTrailer).isEmpty,
      "missing-trailer container accepted — unreadable-payload contract broken")
    // frame-0 dims must come from the IMAGE DESCRIPTOR, not the
    // logical screen descriptor: hand-build a minimal GIF whose
    // declared screen (10x10) exceeds its only frame (3x2) — the walk
    // must report the frame's dims, as ImageIO's getWidth(0) does
    val smallFrame: Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes("US-ASCII"))
      b.putShort(10.toShort).putShort(10.toShort) // screen 10x10
      b.put(0x80.toByte) // global color table, 2 entries
      b.put(0.toByte).put(0.toByte) // bg index, aspect
      b.put(Array[Byte](0, 0, 0, -1, -1, -1)) // 2-entry palette
      b.put(0x2C.toByte) // image descriptor
      b.putShort(0.toShort).putShort(0.toShort) // left, top
      b.putShort(3.toShort).putShort(2.toShort) // frame 3x2
      b.put(0.toByte) // no local color table
      b.put(2.toByte) // LZW min code size
      // one raw data sub-block: clear(4), 6 pixels of index 0, end(5)
      // packed LZW at 3-bit codes — content is irrelevant to the walk
      b.put(3.toByte).put(0x44.toByte).put(0x10.toByte).put(0x05.toByte)
      b.put(0.toByte) // sub-block terminator
      b.put(0x3B.toByte) // trailer
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    assert(VideoDedup.parseGifFast(smallFrame) == Some((3, 2, 1)),
      "walk trusted the declared screen descriptor over frame 0's dims")
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
