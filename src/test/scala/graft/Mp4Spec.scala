package graft

import graft.functions.Mp4
import org.scalatest.funsuite.AnyFunSuite

/** The MP4 leg must be a real container round trip: `write` emits valid
  * ISO BMFF box structure and `parse` demuxes the metadata back from the
  * boxes — not from arithmetic on the input. */
class Mp4Spec extends AnyFunSuite {

  test("write→parse round-trips dimensions, frame count, and brand") {
    for ((w, h, n) <- Seq((64, 64, 1), (640, 380, 7), (65, 381, 3))) {
      val payload = Array.tabulate[Byte](199)(i => (i * 7).toByte)
      val bytes = Mp4.write(w, h, n, payload)
      val m = Mp4.parse(bytes)
      assert(m == Mp4.Meta(w, h, n, "isom",
        sampleSize = math.max(1, payload.length / n),
        chunkOffset = (bytes.length - payload.length).toLong,
        mdatBytes = payload.length.toLong),
        s"round trip failed for $w×$h×$n")
    }
  }

  test("HeaderBytes is the writer's real pre-payload extent (offset-chain pin)") {
    // mm_mp4_atoms' oracle predicts stco/file offsets as HeaderBytes +
    // arithmetic; this pins that the constant IS the byte extent the
    // writer emits before the mdat payload, for several payload sizes
    // (the moov must be fixed-width for the constant to be one at all).
    for (len <- Seq(1, 17, 997)) {
      val payload = Array.tabulate[Byte](len)(i => i.toByte)
      val bytes = Mp4.write(33, 44, 1 + len % 7, payload)
      assert(bytes.length == Mp4.HeaderBytes + len,
        s"header extent drifted at payload $len")
      assert(Mp4.parse(bytes).chunkOffset == Mp4.HeaderBytes.toLong,
        s"stco disagrees with HeaderBytes at payload $len")
    }
  }

  test("written bytes carry real box structure: ftyp magic, mdat payload") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    val bytes = Mp4.write(100, 50, 4, payload)
    // bytes 4..8 of any MP4 are the fourcc of the first box: 'ftyp'
    assert(new String(bytes.slice(4, 8), "US-ASCII") == "ftyp")
    // the payload must be present verbatim inside the mdat box (tail)
    assert(bytes.containsSlice(payload), "mdat payload missing")
    // the declared size of the first box must be consistent
    val ftypSize = java.nio.ByteBuffer.wrap(bytes).getInt(0)
    assert(new String(bytes.slice(ftypSize + 4, ftypSize + 8),
      "US-ASCII") == "moov", "moov must follow ftyp")
  }

  test("parse rejects non-MP4 bytes instead of decoding garbage") {
    intercept[IllegalArgumentException](Mp4.parse("not a video".getBytes))
    intercept[IllegalArgumentException](Mp4.parse(Array[Byte](0, 0, 0, 9)))
    // a valid-looking header whose box size overruns the buffer
    val lying = java.nio.ByteBuffer.allocate(16)
      .putInt(9999).put("ftyp".getBytes).array()
    intercept[IllegalArgumentException](Mp4.parse(lying))
  }

  test("parse handles tkhd version 1 (64-bit times) layouts") {
    // build a v0 file, then splice a v1 tkhd: version byte 1, times and
    // duration widened to 8 bytes (12 extra bytes before the dims)
    val v0 = Mp4.write(320, 240, 2, Array[Byte](1, 2, 3))
    val buf = collection.mutable.ArrayBuffer(v0: _*)
    val at = v0.indexOfSlice("tkhd".getBytes("US-ASCII"))
    assert(at > 0)
    val start = at - 4 // box size field
    val oldSize = java.nio.ByteBuffer.wrap(v0).getInt(start)
    val oldPayload = v0.slice(at + 4, start + oldSize)
    // v1 payload: version=1, flags; c/m times 8+8; id 4; resv 4; dur 8
    val v1Payload = Array[Byte](1, 0, 0, 7) ++
      new Array[Byte](16) ++ oldPayload.slice(12, 16) ++
      new Array[Byte](4) ++ new Array[Byte](8) ++ oldPayload.drop(24)
    val newBox = java.nio.ByteBuffer.allocate(8 + v1Payload.length)
      .putInt(8 + v1Payload.length).put("tkhd".getBytes).put(v1Payload).array()
    buf.remove(start, oldSize)
    buf.insertAll(start, newBox)
    // fix the enclosing trak/moov sizes (+12 bytes each)
    val out = buf.toArray
    val bb = java.nio.ByteBuffer.wrap(out)
    for (fourcc <- Seq("moov", "trak")) {
      val i = out.indexOfSlice(fourcc.getBytes("US-ASCII"))
      bb.putInt(i - 4, bb.getInt(i - 4) + 12)
    }
    assert(Mp4.parse(out).width == 320 && Mp4.parse(out).height == 240)
  }
}
