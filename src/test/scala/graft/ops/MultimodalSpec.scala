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
}
