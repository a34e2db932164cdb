package graft.operators

import graft.Tables.load
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A raw media row: opaque binary payload + typed metadata. */
case class MediaRecord(media_id: Long, format: String, media: Array[Byte])

/** Decoded media metadata (what a real codec would surface). */
case class DecodedMedia(media_id: Long, format: String, n_bytes: Long,
                        width: Int, height: Int, n_frames: Int)

/** Multimodal-column operators: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded via partition-wise typed transforms.
  *
  * The DECODE STEP IS A STUB — this container ships no image/audio codecs,
  * so `decode` derives deterministic fake dimensions from the payload bytes
  * (clearly marked below). Everything around it is the real Spark plumbing a
  * production pipeline needs and is what's tested: binary columns in
  * parquet-friendly schemas, `Dataset[MediaRecord]` typed rows,
  * `mapPartitions` batch iteration (one codec init per partition, NOT per
  * row — the same per-row-init bug the reference has with its sentiment
  * analyzer, redditProcessor.py:24), and frame-level explode downstream.
  *
  * Scale: decode is embarrassingly parallel; partition count (not row count)
  * bounds codec initializations. Frame sampling explodes 1→n_frames/stride
  * rows map-side with no shuffle.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Synthesize a media table from documents: payload = UTF-8 bytes of the
    * text (stands in for real image/audio bytes), format from the source id. */
  def synthesize(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    load(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("mp4").as("format"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
  }

  /** Decode media → metadata. One "codec" init per PARTITION, then batch
    * iteration — the shape a real decoder needs.
    *
    * STUB: dimensions are a deterministic function of payload length; a real
    * deployment replaces the body of `decodeOne` with an actual codec call
    * (e.g. TwelveMonkeys/ImageIO for images, JCodec for video). */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec handle would be created HERE, once per partition
      val codec = new Object
      it.map { r => decodeOne(codec, r) }
    }
  }

  private def decodeOne(codec: AnyRef, r: MediaRecord): DecodedMedia = {
    val n = r.media.length.toLong
    // STUB arithmetic (mirrored by the SQL oracle); replace with codec output
    val width = 64 + (n % 577).toInt
    val height = 64 + ((n * 31) % 317).toInt
    val frames = if (r.format == "mp4") 1 + (n % 7).toInt else 1
    DecodedMedia(r.media_id, r.format, n, width, height, frames)
  }

  /** Metadata-level resize: halve dimensions (min 1). A real impl would
    * re-encode the payload; the metadata contract is what downstream sees. */
  def resize(decoded: Dataset[DecodedMedia], factor: Int): Dataset[DecodedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.map(d => d.copy(width = math.max(1, d.width / factor),
      height = math.max(1, d.height / factor)))
  }

  /** Frame sampling: one row per sampled frame index (stride-strided). */
  def frameSample(decoded: Dataset[DecodedMedia], stride: Int): DataFrame =
    decoded.toDF()
      .select(col("media_id"), col("format"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  val queries: Map[String, Q] = Map(
    // binary ingest → typed mapPartitions decode → metadata columns
    "mm_decode" -> ((s, dir) =>
      decode(synthesize(s, dir)).toDF()
        .orderBy("media_id")),

    // decode → frame sampling explode (video rows fan out, stills stay 1)
    "mm_frames" -> ((s, dir) =>
      frameSample(decode(synthesize(s, dir)), stride = 2)
        .orderBy("media_id", "frame_idx")))

  /** The stub arithmetic is deliberately SQL-expressible so even the
    * mapPartitions path gets a full value-level oracle check. */
  val oracle: Map[String, String] = Map(
    "mm_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'mp4' END AS format,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
        |  CAST(64 + (octet_length(encode(text)) * 31) % 317 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2
        |            THEN 1 + octet_length(encode(text)) % 7 ELSE 1 END AS INT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm_frames" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'png'
        |         WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'mp4' END AS format,
        |    CASE WHEN doc_id % 3 = 2
        |         THEN 1 + octet_length(encode(text)) % 7 ELSE 1 END AS n_frames
        |  FROM documents)
        |SELECT media_id, format, CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx
        |FROM d ORDER BY media_id, frame_idx""".stripMargin)
}
