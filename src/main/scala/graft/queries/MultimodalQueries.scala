package graft.queries

import graft.Tables
import graft.ops.MultimodalOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary payload plumbing that IS oracle-
  * expressible (byte lengths, checksums, sliced windows) — the codegen'd
  * part of the media pipeline. The stubbed decode path is covered by
  * `MultimodalSpec`, not the oracle (mapPartitions isn't SQL). */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Opaque-binary metadata: byte length, md5 checksum, head-slice encoded
    // base64 (the "thumbnail bytes" shape).
    "m1_binary_meta" -> ((s, d) => {
      asMediaRecords(Tables.documents(s, d), "doc_id", "text", "doc")
        .select(col("media_id"), col("kind"), col("byte_len"),
          md5(col("payload")).as("checksum"),
          base64(substring(col("payload"), 1, 8)).as("head_b64"))
        .orderBy(col("media_id"))
    }),

    // Frame sampling over opaque payloads: 4 evenly-spaced byte windows
    // sliced out of each binary payload ([[sampleWindows]]), base64-joined
    // so the output stays scalar. Pure codegen'd substring-on-binary — the
    // shape a video frame sampler's byte-range reads take before decode.
    "m2_frame_windows" -> ((s, d) => {
      val media = asMediaRecords(Tables.documents(s, d), "doc_id", "text", "doc")
      sampleWindows(media, 4, 12)
        .select(col("media_id"), col("byte_len"),
          array_join(transform(col("windows"), w => base64(w)), "|").as("windows_b64"))
        .orderBy(col("media_id"))
    }),

    // The mapPartitions decode path itself, oracle-checked: the stub's fake
    // features are pure md5-of-payload functions, so SQL can specify them
    // exactly — proving the typed imperative path (Dataset[MediaRecord] →
    // mapPartitions → Dataset[MediaFeatures]) computes what the declarative
    // spec says, not just that it runs.
    "m3_decode_features" -> ((s, d) => {
      val media = asMediaRecords(Tables.documents(s, d), "doc_id", "text", "doc")
      decodeStub(s, media).toDF()
        .select(col("media_id"), col("kind"), col("byte_len"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"), col("checksum"))
        .orderBy(col("media_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id AS media_id, 'doc' AS kind,
        |  octet_length(encode(text)) AS byte_len,
        |  md5(text) AS checksum,
        |  base64(encode(substring(text, 1, 8))) AS head_b64
        |FROM documents ORDER BY media_id""".stripMargin,
    // Window starts mirror MultimodalOps.sampleWindows: 1 + i*(len DIV 4)
    // (text is pure ASCII in the corpus, so char offsets == byte offsets).
    "m2_frame_windows" -> {
      val win = (0 until 4).map(i =>
        s"base64(encode(substring(text, 1 + $i * greatest(octet_length(encode(text)) // 4, 1), 12)))")
        .mkString(",\n        ")
      s"""SELECT doc_id AS media_id,
         |  octet_length(encode(text)) AS byte_len,
         |  concat_ws('|',
         |        $win) AS windows_b64
         |FROM documents ORDER BY media_id""".stripMargin
    },
    // mirrors MultimodalOps.decodeStub: ub(i) = i-th md5 digest byte
    "m3_decode_features" ->
      """SELECT doc_id AS media_id, 'doc' AS kind,
        |  octet_length(encode(text)) AS byte_len,
        |  CAST(16 * (1 + ('0x' || substr(md5(text), 1, 2))::INT % 64) AS BIGINT) AS width,
        |  CAST(16 * (1 + ('0x' || substr(md5(text), 3, 2))::INT % 64) AS BIGINT) AS height,
        |  CAST(1 + ('0x' || substr(md5(text), 5, 2))::INT % 30 AS BIGINT) AS n_frames,
        |  md5(text) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
