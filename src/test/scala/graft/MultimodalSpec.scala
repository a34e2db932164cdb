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
