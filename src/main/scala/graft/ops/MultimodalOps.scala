package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads travel as opaque
  * `BINARY` columns next to typed metadata, the layout Spark handles well at
  * 100 TB (parquet binary chunks stream through the columnar reader; the
  * decode step is the only non-codegen stage and is isolated behind
  * `mapPartitions` so it pipelines per-partition without shuffles).
  *
  * The container has no image/audio codec libraries, so [[decodeStub]] is a
  * clearly-marked deterministic FAKE decode (derives "features" from the
  * md5 of the payload bytes). The Spark-side plumbing — schema, typed
  * Dataset, per-partition batch shape, partitioning — is real and tested
  * (`MultimodalSpec`); swapping in a real codec changes only the function
  * body.
  */
object MultimodalOps {

  /** Typed media record: payload + metadata. */
  final case class MediaRecord(media_id: Long, kind: String,
                               payload: Array[Byte], byte_len: Long)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                                 width: Int, height: Int, n_frames: Int,
                                 checksum: String)

  /** Wrap any table into media records: `textCol`'s UTF-8 bytes stand in
    * for the opaque payload (the driver corpus ships no real media). */
  def asMediaRecords(df: DataFrame, idCol: String, textCol: String,
      kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
      col(textCol).cast("binary").as("payload"))
      .withColumn("byte_len", length(col("payload")).cast("long"))

  /** STUB decode: deterministic fake feature extraction from payload bytes.
    * A real implementation would decode the codec here (e.g. JPEG dims,
    * audio sample count, video frame sampling); everything around it —
    * the `mapPartitions` batch shape, the encoder, the output schema —
    * is the production plumbing. */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"), col("byte_len"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // one digest instance per partition — the "decoder context" a real
        // codec would also want amortized across the batch
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val h = md.digest(r.payload)
          def ub(i: Int): Int = h(i) & 0xff
          MediaFeatures(r.media_id, r.kind, r.byte_len,
            width = 16 * (1 + ub(0) % 64),       // fake: 16..1024
            height = 16 * (1 + ub(1) % 64),
            n_frames = 1 + ub(2) % 30,
            checksum = h.map("%02x".format(_)).mkString)
        }
      }
  }

  /** "Frame sample": slice evenly-spaced byte windows out of the payload —
    * the partition-local pattern a video frame sampler uses. Pure built-ins
    * (substring on binary), fully codegen'd. */
  def sampleWindows(media: DataFrame, n: Int, window: Int): DataFrame =
    media.withColumn("windows", array((0 until n).map(i =>
      expr(s"substring(payload, 1 + $i * CAST(greatest(byte_len DIV $n, 1) AS INT), $window)")): _*))

  /** The aHash-style 32-bit payload fingerprint (m10/m11's spatial
    * kernel, shared with the streaming admission gate): bit_i = MSB of
    * md5(tile_i) over a fixed 32-tile grid — a local edit flips only the
    * touched tiles' bits, so lightly-edited payloads of the same length
    * land within small Hamming distance. Column-coupled: expects
    * `payload` (BINARY) and `tw` (tile width, BIGINT) in scope. */
  def phash32: org.apache.spark.sql.Column = expr(
    """aggregate(sequence(0, 31), 0L, (acc, i) ->
      |  acc + IF(substring(md5(substring(payload,
      |        CAST(i * tw + 1 AS INT), CAST(tw AS INT))), 1, 1) >= '8',
      |    shiftleft(1L, i), 0L))""".stripMargin)
}
