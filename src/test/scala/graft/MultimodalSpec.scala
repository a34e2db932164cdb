package graft

import graft.operators.{DecodedMedia, MediaRecord, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** Real-ImageIO multimodal path: the encode→decode round trip must surface
  * the true header dimensions, and codec setup must happen once per
  * PARTITION (not per row). */
class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("png/jpeg bytes are real images: decode recovers the synthesized dimensions") {
    val decoded = Multimodal.decode(Multimodal.synthesize(spark, sfDir))
      .filter(_.format != "mp4").collect()
    assert(decoded.nonEmpty)
    // magic bytes prove a real container, not text payload
    val payloads = Multimodal.synthesize(spark, sfDir)
      .filter(_.format != "mp4").collect().map(r => r.media_id -> r).toMap
    decoded.foreach { d =>
      val bytes = payloads(d.media_id).media
      if (d.format == "png")
        assert(bytes.take(8).sameElements(
          Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)),
          s"media ${d.media_id} lacks PNG magic")
      else
        assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
          s"media ${d.media_id} lacks JPEG SOI marker")
      // header dims must round-trip the dimension spec (16..112 × 16..68)
      assert(d.width >= 16 && d.width <= 112, s"width ${d.width} outside spec")
      assert(d.height >= 16 && d.height <= 68, s"height ${d.height} outside spec")
      assert(d.n_frames == 1)
    }
  }

  test("Png.write emits real PNG: ImageIO round-trips it pixel-exact") {
    // Third-party decodability is the claim that separates a real
    // container writer from a self-consistent byte blob: javax.imageio's
    // PNG plugin (an independent implementation) must parse the chunk
    // tree, inflate the stored-deflate zlib stream, and recover the
    // EXACT pixel bytes the writer cycled from the payload.
    import graft.functions.Png
    val payload = "the quick brown fox".getBytes("UTF-8")
    for ((w, h) <- Seq((8, 8), (37, 11), (104, 60))) {
      val bytes = Png.write(w, h, payload)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected the $w x $h PNG")
      assert(img.getWidth == w && img.getHeight == h)
      var k = 0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val want = Seq(payload(k % payload.length), payload((k + 1) % payload.length),
          payload((k + 2) % payload.length)).map(_ & 0xff)
        val got = Seq((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        assert(got == want, s"pixel ($x,$y) of $w x $h: $got != $want")
        k += 3
      }
      // the parser agrees with itself and with the layout arithmetic
      val m = Png.parse(bytes)
      assert(m.width == w && m.height == h && m.bitDepth == 8 && m.colorType == 2)
      assert(m.nChunks == 3 && m.crcOk == 3, "a chunk CRC failed")
      assert(m.idatBytes == Png.zlibBytes(Png.rawBytes(w, h)))
      assert(m.fileBytes == bytes.length.toLong)
    }
    // multi-block path: raw > 65535 forces a second stored block
    val big = Png.write(300, 80, payload) // raw = 80*901 = 72080 > 65535
    val bm = Png.parse(big)
    assert(bm.crcOk == 3 && bm.idatBytes == Png.zlibBytes(72080L))
    val bimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(big))
    assert(bimg != null && bimg.getWidth == 300 && bimg.getHeight == 80)
    // a flipped payload bit must surface as a CRC failure, not silence
    val tampered = Png.write(37, 11, payload).clone()
    tampered(50) = (tampered(50) ^ 1).toByte // inside IDAT data
    assert(Png.parse(tampered).crcOk < 3, "tampering went undetected")
    // a corrupt chunk LENGTH must fail as "corrupt chunk length", never
    // as a NegativeArraySizeException / BufferUnderflowException or a
    // multi-GB allocation
    val negLen = Png.write(5, 5, payload).clone()
    negLen(8) = 0xff.toByte // IHDR length 0x0000000d -> 0xff00000d (<0)
    val e1 = intercept[IllegalArgumentException](Png.parse(negLen))
    assert(e1.getMessage.contains("corrupt chunk length"))
    val overLen = Png.write(5, 5, payload).clone()
    overLen(10) = 0x7f.toByte // IHDR length -> 0x007f000d, way past EOF
    val e2 = intercept[IllegalArgumentException](Png.parse(overLen))
    assert(e2.getMessage.contains("corrupt chunk length"))
    // truncated mid-chunk: the remaining-bytes guard, not underflow
    val truncated = Png.write(5, 5, payload).take(20)
    val e3 = intercept[IllegalArgumentException](Png.parse(truncated))
    assert(e3.getMessage.contains("corrupt chunk length"))
  }

  test("mp4 bytes are real ISO BMFF containers: decode demuxes the box tree") {
    val payloads = Multimodal.synthesize(spark, sfDir)
      .filter(_.format == "mp4").collect()
    assert(payloads.nonEmpty)
    payloads.foreach { r =>
      assert(new String(r.media.slice(4, 8), "US-ASCII") == "ftyp",
        s"media ${r.media_id} lacks ftyp box")
    }
    val decoded = Multimodal.decode(Multimodal.synthesize(spark, sfDir))
      .filter(_.format == "mp4").collect()
    decoded.foreach { d =>
      // demuxed values must land inside the video track spec's range
      assert(d.width >= 64 && d.width < 64 + 577, s"width ${d.width} outside spec")
      assert(d.height >= 64 && d.height < 64 + 317, s"height ${d.height} outside spec")
      assert(d.n_frames >= 1 && d.n_frames <= 7, s"frames ${d.n_frames} outside spec")
      // n_bytes is the CONTAINER size — strictly larger than any payload
      assert(d.n_bytes > 500, "container overhead missing — payload not wrapped")
    }
  }

  test("wav bytes are real RIFF containers: decode recovers the audio spec") {
    val payloads = Multimodal.synthesizeAudio(spark, sfDir).collect()
    assert(payloads.nonEmpty)
    payloads.foreach { r =>
      // RIFF....WAVE magic proves a real container written by javax.sound
      assert(new String(r.media.take(4), "US-ASCII") == "RIFF",
        s"media ${r.media_id} lacks RIFF magic")
      assert(new String(r.media.slice(8, 12), "US-ASCII") == "WAVE",
        s"media ${r.media_id} lacks WAVE id")
    }
    val decoded = Multimodal.queries("mm_audio")(spark, sfDir).collect()
    decoded.foreach { d =>
      assert(d.getInt(1) == 8000 && d.getInt(2) == 1)
      val frames = d.getLong(3)
      assert(frames >= 16 && frames < 16 + 997, s"frames $frames outside spec")
    }
    // deterministic: same media bytes on re-synthesis
    val again = Multimodal.synthesizeAudio(spark, sfDir).collect()
      .map(r => r.media_id -> r.media).toMap
    payloads.foreach(r => assert(java.util.Arrays.equals(again(r.media_id), r.media)))
  }

  test("decode initializes codecs once per partition, not per row") {
    val inits = spark.sparkContext.longAccumulator("codecInits")
    val media = (1L to 100L).map(i =>
      MediaRecord(i, if (i % 2 == 0) "png" else "jpeg",
        Array.fill(8)(0.toByte))).toDS().repartition(5)
    // payloads are garbage — decode only after re-encoding them properly
    val real = Multimodal.decode(Multimodal.synthesize(spark, sfDir)
      .repartition(5), Some(inits))
    val n = real.count()
    assert(n > 0)
    assert(inits.value == 5,
      s"expected 1 codec init per partition (5), got ${inits.value} for $n rows")
    assert(media.rdd.getNumPartitions == 5) // keep the fixture honest
  }

  test("resize halves metadata dimensions with floor 1") {
    val d = Seq(DecodedMedia(1, "png", 10, 33, 1, 1)).toDS()
    val r = Multimodal.resize(d, 2).head()
    assert(r.width == 16 && r.height == 1)
  }
}
