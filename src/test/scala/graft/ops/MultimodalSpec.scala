package graft.ops

import graft.{SparkSpecBase, Tables}
import graft.ops.MultimodalOps._
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val media =
    asMediaRecords(Tables.documents(spark, sfDir).limit(50), "doc_id", "text", "image")

  test("media records carry opaque binary payloads with byte lengths") {
    val rows = media.select(col("byte_len"), length(col("payload")).cast("long"))
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall { case (a, b) => a == b && a > 0 })
  }

  test("decode stub is deterministic and emits plausible feature ranges") {
    val f1 = decodeStub(spark, media).collect().sortBy(_.media_id)
    val f2 = decodeStub(spark, media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq, "stub decode must be deterministic")
    assert(f1.forall(f => f.width >= 16 && f.width <= 1024))
    assert(f1.forall(f => f.height >= 16 && f.height <= 1024))
    assert(f1.forall(f => f.n_frames >= 1 && f.n_frames <= 30))
    assert(f1.forall(_.checksum.length == 32))
  }

  test("decode stub checksum matches the codegen'd md5 column") {
    val viaExpr = media.select(col("media_id"), md5(col("payload")).as("m"))
      .as[(Long, String)].collect().toMap
    decodeStub(spark, media).collect().foreach { f =>
      assert(f.checksum == viaExpr(f.media_id))
    }
  }

  test("frame-window sampling yields n binary slices per record") {
    val out = sampleWindows(media, n = 4, window = 16)
      .select(col("media_id"), col("windows"))
    val rows = out.as[(Long, Seq[Array[Byte]])].collect()
    assert(rows.forall(_._2.length == 4))
    assert(rows.forall(_._2.forall(w => w.length <= 16)))
  }

  test("m9 interleaved pack conserves items and token budget exactly") {
    // the p5 discipline: packing must neither drop nor double-pack —
    // per-lang shard totals re-sum to the corpus-wide item count and
    // token_equiv mass computed independently of the window/groupBy path
    val shards = graft.queries.MultimodalQueries
      .queries("m9_interleaved_pack")(spark, sfDir)
    val (gotItems, gotToks) = shards
      .agg(sum(col("n_media")), sum(col("tok_total")))
      .as[(Long, Long)].collect().head
    val (expItems, expToks) = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("byte_len"))
      .select(expr("""CASE doc_id % 3 WHEN 0 THEN byte_len div 4
                     |WHEN 1 THEN 256 + byte_len div 1024
                     |ELSE byte_len div 320 END""".stripMargin).as("te"))
      .agg(count(lit(1)), sum(col("te")))
      .as[(Long, Long)].collect().head
    assert(gotItems == expItems, "packed item count != corpus item count")
    assert(gotToks == expToks, "packed token mass != corpus token mass")
    // modality split conserves too
    val kinds = shards.agg(sum(col("n_text")), sum(col("n_image")),
      sum(col("n_audio"))).as[(Long, Long, Long)].collect().head
    assert(kinds._1 + kinds._2 + kinds._3 == expItems)
  }

  test("m10 phash: identical payloads collide at hamming 0, " +
      "single-tile edits stay within band recall") {
    // synthetic media frame: two byte-identical payloads plus one with a
    // single edited tile — the pHash contract is LOCALITY (an edit flips
    // only the touched tile's bit), which is what makes Hamming banding
    // a near-dup signal rather than an exact-hash one
    val base = ("x" * 320) // 32 tiles of 10 bytes
    val edited = base.substring(0, 160) + "Y" + base.substring(161)
    val df = Seq((1L, base), (2L, base), (3L, edited))
      .toDF("doc_id", "text")
    val pairs = graft.queries.MultimodalQueries
      .queries("m10_phash_neardup")(spark, sfDir) // plan compiles on corpus
    assert(pairs.columns.toSeq == Seq("media_a", "media_b", "hamming"))
    // direct kernel check on the synthetic frame
    val media = asMediaRecords(df, "doc_id", "text", "doc")
    val ph = media
      .withColumn("tw", greatest(expr("byte_len div 32"), lit(1L)))
      .withColumn("phash", expr(
        """aggregate(sequence(0, 31), 0L, (acc, i) ->
          |  acc + IF(substring(md5(substring(payload,
          |        CAST(i * tw + 1 AS INT), CAST(tw AS INT))), 1, 1) >= '8',
          |    shiftleft(1L, i), 0L))""".stripMargin))
      .select(col("media_id"), col("phash"))
      .as[(Long, Long)].collect().toMap
    assert(ph(1L) == ph(2L), "identical payloads must share the phash")
    val ham = java.lang.Long.bitCount(ph(1L) ^ ph(3L))
    assert(ham == 1, s"one edited tile must flip exactly " +
      s"that tile's bit, got hamming $ham")
  }
}
