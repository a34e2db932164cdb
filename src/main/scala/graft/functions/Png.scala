package graft.functions

import java.nio.ByteBuffer
import java.util.zip.{Adler32, CRC32}

/** Minimal PNG (ISO/IEC 15948) writer + chunk-tree parser, pure JVM.
  *
  * The writer emits a structurally valid truecolor PNG — signature,
  * `IHDR`, one `IDAT` whose zlib stream uses STORED (uncompressed)
  * deflate blocks, `IEND` — with every chunk CRC32-summed per the spec.
  * Stored blocks make the byte layout a pure function of (width,
  * height): raw = h·(1 + 3w) filter-prefixed scanline bytes, wrapped as
  * 2 (zlib header) + ⌈raw/65535⌉·5 (block headers) + raw + 4 (adler32),
  * so an external oracle can predict every offset and length
  * arithmetically — the same offset-chain discipline as [[Mp4]]. The
  * output is real PNG: any third-party decoder (ImageIO in
  * MultimodalSpec) reads it back pixel-exact.
  *
  * The parser is a real chunk walker: it checks the 8-byte signature,
  * iterates (length, fourcc, data, crc32) frames, RECOMPUTES each CRC
  * over type+data, reads the IHDR geometry fields, and accumulates the
  * IDAT extent — surfacing the integrity count (`crcOk`) and the byte
  * offsets only the physical layout determines.
  *
  * Scale notes: both directions are per-row and allocation-bounded by
  * the payload; no shared state, no codec handles — embarrassingly
  * parallel inside `mapPartitions`.
  */
object Png {

  /** Parsed chunk-level metadata. `idatOffset` is the file offset of the
    * first IDAT chunk's length field; `idatBytes` the summed IDAT data
    * lengths (the zlib stream size); `crcOk` the number of chunks whose
    * stored CRC32 matches a recomputation over type+data. */
  final case class Meta(width: Int, height: Int, bitDepth: Int,
                        colorType: Int, nChunks: Int, crcOk: Int,
                        idatBytes: Long, idatOffset: Long, fileBytes: Long)

  private val Signature =
    Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)

  private def u32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v.toInt).array()

  private def crc(tpe: String, data: Array[Byte]): Array[Byte] = {
    val c = new CRC32
    c.update(tpe.getBytes("ISO-8859-1"))
    c.update(data)
    u32(c.getValue)
  }

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] =
    u32(data.length.toLong) ++ tpe.getBytes("ISO-8859-1") ++ data ++
      crc(tpe, data)

  /** Raw filtered-scanline byte count for an (w, h) RGB8 image. */
  def rawBytes(w: Int, h: Int): Long = h.toLong * (1L + 3L * w)

  /** zlib-stream byte count for `raw` bytes in stored deflate blocks
    * (at least one block even for an empty stream). */
  def zlibBytes(raw: Long): Long =
    2L + math.max(1L, (raw + 65534L) / 65535L) * 5L + raw + 4L

  /** A truecolor (8-bit RGB) PNG whose pixel bytes cycle through
    * `payload` (filter type 0 on every scanline). */
  def write(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val p = if (payload.isEmpty) Array[Byte](0) else payload
    val raw = new Array[Byte](rawBytes(w, h).toInt)
    var i = 0
    var k = 0
    var y = 0
    while (y < h) {
      raw(i) = 0 // filter: None
      i += 1
      var x = 0
      while (x < 3 * w) {
        raw(i) = p(k % p.length)
        i += 1; k += 1; x += 1
      }
      y += 1
    }
    // zlib wrapper: 0x78 0x01 header, stored deflate blocks, adler32
    val zl = ByteBuffer.allocate(zlibBytes(raw.length.toLong).toInt)
    zl.put(0x78.toByte).put(0x01.toByte)
    var off = 0
    while (off < raw.length || (raw.length == 0 && off == 0)) {
      val n = math.min(65535, raw.length - off)
      val fin = if (off + n >= raw.length) 1 else 0
      zl.put(fin.toByte)
      zl.put((n & 0xff).toByte).put(((n >> 8) & 0xff).toByte)
      zl.put(((~n) & 0xff).toByte).put((((~n) >> 8) & 0xff).toByte)
      zl.put(raw, off, n)
      off += n
      if (n == 0) off = raw.length + 1 // degenerate 0×0: one empty block
    }
    val ad = new Adler32
    ad.update(raw)
    zl.put(u32(ad.getValue))
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, none
      .array()
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zl.array()) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Walk the chunk tree, recomputing CRCs and reading IHDR geometry. */
  def parse(bytes: Array[Byte]): Meta = {
    require(bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == Signature(i)),
      "not a PNG: bad signature")
    val bb = ByteBuffer.wrap(bytes)
    bb.position(8)
    var (w, hh, bd, ct) = (0, 0, 0, 0)
    var nChunks = 0
    var crcOk = 0
    var idatBytes = 0L
    var idatOffset = -1L
    while (bb.remaining() >= 12) {
      val chunkOff = bb.position().toLong
      val len = bb.getInt
      // The 4-byte length is attacker-controlled input: a corrupt or
      // truncated buffer must fail as "corrupt PNG", not as a
      // NegativeArraySizeException / BufferUnderflowException or a
      // multi-GB allocation. Mirror the signature require above.
      require(len >= 0 && len.toLong + 8 <= bb.remaining(), // type+data+crc
        s"not a PNG: corrupt chunk length $len at offset $chunkOff " +
          s"(${bb.remaining()} bytes remain)")
      val tpeB = new Array[Byte](4)
      bb.get(tpeB)
      val tpe = new String(tpeB, "ISO-8859-1")
      val data = new Array[Byte](len)
      bb.get(data)
      val stored = bb.getInt
      val c = new CRC32
      c.update(tpeB); c.update(data)
      nChunks += 1
      if (c.getValue.toInt == stored) crcOk += 1
      tpe match {
        case "IHDR" =>
          val ib = ByteBuffer.wrap(data)
          w = ib.getInt; hh = ib.getInt
          bd = ib.get() & 0xff; ct = ib.get() & 0xff
        case "IDAT" =>
          if (idatOffset < 0) idatOffset = chunkOff
          idatBytes += len
        case _ => ()
      }
    }
    Meta(w, hh, bd, ct, nChunks, crcOk, idatBytes, idatOffset,
      bytes.length.toLong)
  }
}
