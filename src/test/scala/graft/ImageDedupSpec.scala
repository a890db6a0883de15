package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, ImageDedup}
import graft.sources.Tables

/** F2/F3 gates: the PNG round trip must be exact (render → encode →
  * decode → resize → dHash recovers the planted bits), the dHash must
  * be a PERCEPTUAL hash (invariant under brightness shift and bounded
  * noise — the property that makes it a near-dup signal, not a byte
  * hash), and the hamming-index composition must equal C3's pair set
  * on the shared fingerprint space. */
class ImageDedupSpec extends SparkSpec {

  private def perturb(png: Array[Byte], shift: Int, noiseAmp: Int,
                      seed: Long): Array[Byte] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
    val out = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(seed)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val v = img.getRaster.getSample(x, y, 0) + shift +
        (if (noiseAmp > 0) rnd.nextInt(2 * noiseAmp + 1) - noiseAmp else 0)
      out.getRaster.setSample(x, y, 0, math.max(0, math.min(255, v)))
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", baos)
    baos.toByteArray
  }

  test("decoded dHash recovers every document's simhash bit-for-bit through the PNG codec") {
    val want = Dedup.simhashSigs(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = ImageDedup.decodedSigs(ImageDedup.imageTable(spark, sfDir))
      .collect().map(s => s.doc_id -> s.simhash).toMap
    assert(got.keySet == want.keySet, "docs lost in the codec round trip")
    val bad = got.count { case (id, h) => want(id) != h }
    assert(bad == 0, s"$bad of ${got.size} docs mis-recovered their hash")
  }

  test("dHash is perceptual: brightness shift and bounded noise leave it unchanged; byte hash changes") {
    val blobs = ImageDedup.imageTable(spark, sfDir).limit(20).collect()
    assert(blobs.length == 20)
    for (b <- blobs; (shift, amp) <- Seq((10, 0), (-12, 0), (0, 2), (7, 2))) {
      val p = perturb(b.png, shift, amp, seed = b.doc_id)
      assert(!java.util.Arrays.equals(p, b.png), "perturbation was a no-op")
      val h0 = ImageDedup.dHash(b.png).get
      val h1 = ImageDedup.dHash(p).get
      assert(h0 == h1,
        s"doc ${b.doc_id} dHash changed under shift=$shift amp=$amp: " +
          s"ham ${java.lang.Long.bitCount(h0 ^ h1)}")
    }
    // and a CONTENT change (one cell inverted) must move the hash
    val b = blobs.head
    val img = ImageIO.read(new java.io.ByteArrayInputStream(b.png))
    for (y <- 0 until 8; x <- 0 until 8)
      img.getRaster.setSample(x, y, 0, 255 - img.getRaster.getSample(x, y, 0))
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    val hc = ImageDedup.dHash(baos.toByteArray).get
    assert(hc != ImageDedup.dHash(b.png).get, "content change left the hash fixed")
  }

  test("exact image dedup groups byte-identical PNGs exactly like text identity") {
    val got = ImageDedup.imageDedupExact(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byText = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val groups = byText.groupBy(_._2).map { case (_, rs) =>
      (rs.map(_._1).min, rs.length.toLong, rs.map(_._1).toSet)
    }
    val expect = (for {
      (canon, size, ids) <- groups
      id <- ids
    } yield (id, canon, size, id != canon)).toSet
    assert(got.toSet == expect, "image byte groups diverged from text identity")
    // the corpus's near-dups are token-shuffled (C1 keys on the BAG
    // signature), so byte-identical payloads need planting: re-ingest
    // one blob under a new id — the exact layer must fold it into the
    // original's group and nothing else
    import spark.implicits._
    val blobs = ImageDedup.imageTable(spark, sfDir).limit(3).collect()
    val planted = (blobs :+ blobs.head.copy(doc_id = 999999L)).toSeq
      .toDS().toDF()
    val dup = ImageDedup.imageDedupExactFrom(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(dup.filter(_._4).map(_._1).toSeq == Seq(999999L),
      s"planted byte-dup not detected (or extras): ${dup.mkString(", ")}")
    assert(dup.find(_._1 == 999999L).get._2 == blobs.head.doc_id,
      "planted dup not canonicalized to its original")
  }

  test("image near-dup clusters equal a transitive-closure recompute of the pair graph") {
    val pairs = ImageDedup.imageNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // union-find over the collected pair set
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = members.map(id => (id, find(id), id == find(id))).toSet
    val got = ImageDedup.imageDupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expect, "image clusters diverged from the union-find recompute")
  }

  test("streaming image matches equal the batch pair set through a real stream") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("f5").toFile.getPath
    try {
      ImageDedup.imageTable(spark, sfDir).toDF()
        .write.mode("overwrite").parquet(s"$tmp/blobs")
      val index = ImageDedup.imageBandIndex(spark, sfDir).persist()
      index.count()
      val stream = spark.readStream
        .schema("doc_id BIGINT, png BINARY").parquet(s"$tmp/blobs")
        .as[ImageDedup.ImageBlob]
      val name = "f5_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = ImageDedup.imageStreamMatches(stream, index)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table(name).collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)))).toSet
      val want = ImageDedup.imageNearDup(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want,
        s"stream matches diverged: ${(got diff want).size} extra, " +
          s"${(want diff got).size} missing")
      index.unpersist()
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("image near-dup pairs through the decoded-pixel path equal C3's simhash pairs") {
    val img = ImageDedup.imageNearDup(spark, sfDir)
    val txt = Dedup.simhash(spark, sfDir)
    assert(img.exceptAll(txt).isEmpty && txt.exceptAll(img).isEmpty,
      "decoded-pixel pair set diverged from the text simhash pair set")
    assert(img.count() > 0, "fixture has no near-dup pairs — near layer untested")
  }
}
