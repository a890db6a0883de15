package graft

import graft.operators.{AudioDedup, Dedup}

/** F6/F7 gates: the WAV round trip recovers the planted fingerprint
  * bit-for-bit through the real RIFF/PCM codec path, the fingerprint
  * is PERCEPTUAL (gain- and noise-invariant, content-sensitive), and
  * the hamming-index composition equals C3's pair set. */
class AudioDedupSpec extends SparkSpec {

  /** Same 44-byte header, transformed PCM. */
  private def perturb(wav: Array[Byte], gain: Double, noiseAmp: Int,
                      seed: Long): Array[Byte] = {
    val out = wav.clone()
    val rnd = new scala.util.Random(seed)
    var i = 44
    while (i + 1 < out.length) {
      val v = ((out(i) & 0xFF) | ((out(i + 1) & 0xFF) << 8)).toShort
      val n = if (noiseAmp > 0) rnd.nextInt(2 * noiseAmp + 1) - noiseAmp else 0
      val w = math.max(Short.MinValue, math.min(Short.MaxValue,
        math.round(v * gain) + n)).toInt
      out(i) = (w & 0xFF).toByte
      out(i + 1) = ((w >> 8) & 0xFF).toByte
      i += 2
    }
    out
  }

  test("decoded fingerprint recovers every document's simhash through the WAV codec") {
    val want = Dedup.simhashSigs(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = AudioDedup.audioTable(spark, sfDir).collect()
      .map(a => a.doc_id -> AudioDedup.audioFingerprint(a.wav).get).toMap
    assert(got.keySet == want.keySet)
    val bad = got.count { case (id, h) => want(id) != h }
    assert(bad == 0, s"$bad of ${got.size} docs mis-recovered their fingerprint")
  }

  test("fingerprint is perceptual: gain and bounded noise leave it fixed; content change moves it") {
    val blobs = AudioDedup.audioTable(spark, sfDir).limit(20).collect()
    for (b <- blobs; (gain, amp) <- Seq((1.25, 0), (0.8, 0), (1.0, 20), (1.1, 20))) {
      val p = perturb(b.wav, gain, amp, seed = b.doc_id)
      assert(!java.util.Arrays.equals(p, b.wav))
      val h0 = AudioDedup.audioFingerprint(b.wav).get
      val h1 = AudioDedup.audioFingerprint(p).get
      assert(h0 == h1, s"doc ${b.doc_id} fp moved under gain=$gain amp=$amp: " +
        s"ham ${java.lang.Long.bitCount(h0 ^ h1)}")
    }
    // swapping a frame pair's energies must flip that bit
    val b = blobs.head
    val h0 = AudioDedup.audioFingerprint(b.wav).get
    val flipped = perturb(b.wav, 1.0, 0, 0)
    // crush frame 1 (samples 40..79) to near-silence: bit 0 flips
    // iff it was 1 (loud second frame), else stays 0 — force a doc
    // whose bit 0 is 1
    val target = blobs.find(x =>
      (AudioDedup.audioFingerprint(x.wav).get & 1L) == 1L).getOrElse(b)
    val t = target.wav.clone()
    for (i <- 0 until 40) {
      t(44 + 2 * (40 + i)) = 1; t(44 + 2 * (40 + i) + 1) = 0
    }
    val ht = AudioDedup.audioFingerprint(t).get
    assert((ht & 1L) == 0L, "crushed loud frame should zero bit 0")
    assert(ht != AudioDedup.audioFingerprint(target.wav).get)
    locally { val _ = (h0, flipped) } // silence unused warnings
  }

  test("audio near-dup pairs equal C3's simhash pairs") {
    val audio = AudioDedup.audioNearDup(spark, sfDir)
    val txt = Dedup.simhash(spark, sfDir)
    assert(audio.exceptAll(txt).isEmpty && txt.exceptAll(audio).isEmpty,
      "audio pair set diverged from the text simhash pair set")
    assert(audio.count() > 0)
  }
}
