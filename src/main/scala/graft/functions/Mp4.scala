package graft.functions

import java.nio.ByteBuffer

/** Minimal ISO BMFF (MP4) container writer + metadata parser, pure JVM.
  *
  * The JDK ships no video codec, but extracting video METADATA (track
  * dimensions, frame count, duration) never needed one: those live in the
  * container's box tree (`moov/trak/tkhd`, `moov/.../stbl/stsz`), not in
  * the coded bitstream. This closes the last multimodal stub: `write`
  * emits a structurally valid single-video-track MP4 — `ftyp`, a full
  * `moov` (mvhd, tkhd, mdhd, hdlr, vmhd, dinf/dref, stsd with a
  * VisualSampleEntry, stts, stsc, stsz, stco) and an `mdat` holding the
  * payload — and `parse` is a real box-tree demuxer: it walks the
  * size+fourcc box grammar, recurses into container boxes, and reads the
  * track header and sample-size table. Box layouts follow the public
  * ISO/IEC 14496-12 structure (the same grammar mp4box/ffprobe parse).
  *
  * Scale notes: both directions are per-row, allocation-bounded by the
  * payload size, and run inside `mapPartitions` with zero shared state —
  * embarrassingly parallel, no codec handles to pool.
  */
object Mp4 {

  /** Parsed container metadata: dimensions from `tkhd` (16.16 fixed
    * point), frame count + uniform sample size from `stsz`, the first
    * chunk's absolute file offset from `stco`, the `mdat` payload extent,
    * major brand from `ftyp`. The last three only exist inside the byte
    * tree — surfacing them lets the oracle check the OFFSET CHAIN (which
    * depends on every box's byte size), not just the logical metadata. */
  final case class Meta(width: Int, height: Int, nFrames: Int, brand: String,
                        sampleSize: Int = 0, chunkOffset: Long = 0L,
                        mdatBytes: Long = 0L)

  /** Container bytes that precede the mdat payload (`ftyp` + the
    * fixed-width single-track `moov` + the mdat header) — a writer
    * CONSTANT because every box this writer emits is fixed-width.
    * Derived from the writer itself (not hand-summed box arithmetic) so
    * the mm_mp4_atoms oracle can predict stco/file offsets from the same
    * code that wrote the bytes; Mp4Spec pins the two stay consistent. */
  lazy val HeaderBytes: Int = write(1, 1, 1, Array[Byte](0)).length - 1

  private val Timescale = 1000
  private val FrameDur = 40 // 25 fps in mvhd/mdhd timescale units

  // ---------------------------------------------------------------- write

  private def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  private def u32(vs: Long*): Array[Byte] = {
    val b = ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => b.putInt(v.toInt))
    b.array()
  }

  private def u16(vs: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(2 * vs.length)
    vs.foreach(v => b.putShort(v.toShort))
    b.array()
  }

  private def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
    val size = 8 + parts.map(_.length).sum
    val b = ByteBuffer.allocate(size)
    b.putInt(size)
    b.put(ascii(tpe))
    parts.foreach(b.put)
    b.array()
  }

  /** Identity transform matrix used by mvhd and tkhd (fixed-point). */
  private def unityMatrix: Array[Byte] =
    u32(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L)

  /** `moov` for one video track. `chunkOffset` is the absolute file
    * offset of the mdat payload (stco's one entry); the caller resolves
    * the circular size dependency with a fixed-size two-pass build. */
  private def moov(width: Int, height: Int, nFrames: Int, sampleSize: Int,
                   chunkOffset: Long): Array[Byte] = {
    val duration = nFrames.toLong * FrameDur
    val mvhd = box("mvhd",
      u32(0, 0, 0, Timescale, duration, 0x10000L), // v/flags, times, rate
      u16(0x0100, 0), u32(0, 0), // volume, reserved
      unityMatrix, u32(0, 0, 0, 0, 0, 0), u32(2)) // pre_defined, next track
    val tkhd = box("tkhd",
      u32(7, 0, 0, 1, 0, duration), // v/flags=7, times, track 1, reserved
      u32(0, 0), u16(0, 0, 0, 0), unityMatrix,
      u32(width.toLong << 16, height.toLong << 16)) // 16.16 fixed point
    val mdhd = box("mdhd",
      u32(0, 0, 0, Timescale, duration), u16(0x55c4, 0)) // lang 'und'
    val hdlr = box("hdlr",
      u32(0, 0), ascii("vide"), u32(0, 0, 0), ascii("graft"), Array[Byte](0))
    val stsd = box("stsd", u32(0, 1), box("mp4v",
      u32(0), u16(0, 1, 0, 0), u32(0, 0, 0), // reserved, data_ref_index 1
      u16(width, height), u32(0x480000L, 0x480000L, 0), u16(1), // 72 dpi
      new Array[Byte](32), u16(0x18), u16(-1 & 0xffff))) // depth 24
    val stts = box("stts", u32(0, 1, nFrames, FrameDur))
    val stsc = box("stsc", u32(0, 1, 1, nFrames, 1))
    val stsz = box("stsz", u32(0, sampleSize, nFrames)) // uniform sizes
    val stco = box("stco", u32(0, 1, chunkOffset))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val dinf = box("dinf", box("dref", u32(0, 1), box("url ", u32(1))))
    val vmhd = box("vmhd", u32(1), u16(0, 0, 0, 0))
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    box("moov", mvhd, trak)
  }

  /** A complete MP4 file: ftyp + moov + mdat(payload). The payload is
    * split into `nFrames` uniform samples (stsz shorthand); the last
    * sample absorbs the remainder, which metadata consumers never read. */
  def write(width: Int, height: Int, nFrames: Int,
            payload: Array[Byte]): Array[Byte] = {
    require(nFrames > 0, "nFrames must be positive")
    val ftyp = box("ftyp", ascii("isom"), u32(0x200), ascii("isommp42"))
    val sampleSize = math.max(1, payload.length / nFrames)
    // two-pass: moov's byte size is offset-independent (stco payload is
    // fixed-width), so build once to learn it, then with the real offset
    val moovLen = moov(width, height, nFrames, sampleSize, 0L).length
    val mdatPayloadOffset = ftyp.length.toLong + moovLen + 8
    val m = moov(width, height, nFrames, sampleSize, mdatPayloadOffset)
    val mdat = box("mdat", payload)
    val out = ByteBuffer.allocate(ftyp.length + m.length + mdat.length)
    out.put(ftyp).put(m).put(mdat)
    out.array()
  }

  // ---------------------------------------------------------------- parse

  private val Containers =
    Set("moov", "trak", "mdia", "minf", "stbl", "edts", "dinf", "udta")

  /** Walk the box tree in [from, to), recursing into container boxes;
    * calls `visit(fourcc, payloadStart, payloadEnd)` per leaf box. A box
    * whose declared size overruns its parent is a structural error. */
  private def walk(b: ByteBuffer, from: Int, to: Int)
                  (visit: (String, Int, Int) => Unit): Unit = {
    var p = from
    while (p < to) {
      if (to - p < 8) throw new IllegalArgumentException(
        s"truncated box header at $p")
      val size = b.getInt(p)
      val tpe = new String(
        Array(b.get(p + 4), b.get(p + 5), b.get(p + 6), b.get(p + 7)),
        "ISO-8859-1")
      if (size < 8 || p + size > to) throw new IllegalArgumentException(
        s"box '$tpe' size $size overruns parent at $p")
      if (Containers(tpe)) walk(b, p + 8, p + size)(visit)
      else visit(tpe, p + 8, p + size)
      p += size
    }
  }

  /** Demux container metadata. Handles tkhd/mdhd version 0 and 1 layouts
    * (64-bit times shift the width/height fields), uniform and per-sample
    * stsz forms. Throws on structural violations — a non-MP4 payload must
    * fail loudly, not decode to garbage. */
  def parse(bytes: Array[Byte]): Meta = {
    val b = ByteBuffer.wrap(bytes)
    var brand: String = null
    var width, height, nFrames, sampleSize = -1
    var chunkOffset, mdatBytes = -1L
    walk(b, 0, bytes.length) { (tpe, s, e) =>
      tpe match {
        case "ftyp" =>
          brand = new String(bytes.slice(s, s + 4), "ISO-8859-1")
        case "tkhd" =>
          val version = b.get(s) & 0xff
          // version/flags(4) + create/modify times (4+4 in v0, 8+8 in v1)
          // + track_id(4) + reserved(4) + duration(4 in v0, 8 in v1)
          val dimOff = s + (if (version == 1) 36 else 24) +
            8 + 8 + 36 // reserved(8) + layer/group/volume/resv(8) + matrix
          width = b.getInt(dimOff) >>> 16 // 16.16 fixed -> integer part
          height = b.getInt(dimOff + 4) >>> 16
        case "stsz" =>
          sampleSize = b.getInt(s + 4) // uniform size (0 = per-sample table)
          nFrames = b.getInt(s + 8) // after version/flags + sample_size
        case "stco" =>
          chunkOffset = b.getInt(s + 8).toLong & 0xffffffffL // first entry
        case "mdat" =>
          mdatBytes = (e - s).toLong
        case _ => () // other leaves: metadata never reads them
      }
      if (e > bytes.length) throw new IllegalArgumentException("overrun")
    }
    if (brand == null || width < 0 || nFrames < 0)
      throw new IllegalArgumentException(
        "not a parseable MP4: missing ftyp/tkhd/stsz")
    Meta(width, height, nFrames, brand, sampleSize, chunkOffset, mdatBytes)
  }
}
