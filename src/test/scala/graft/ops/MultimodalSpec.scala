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

  test("m11 collapse: every m10 pair lands in one cluster, byte " +
      "accounting reconciles, keepers are cluster minima") {
    val pairs = graft.queries.MultimodalQueries
      .queries("m10_phash_neardup")(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    val clusters = graft.queries.MultimodalQueries
      .queries("m11_phash_collapse")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(clusters.nonEmpty, "pair graph is non-empty so clusters must be")
    // union-find ground truth over the m10 pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.groupBy(find).map { case (_, ms) =>
      ms.min -> ms.toSet
    }
    assert(clusters.map(_._1).toSet == truth.keySet,
      "keeper set != min-id roots of the pair graph")
    clusters.foreach { case (keeper, n, dropped, _, last) =>
      assert(n == truth(keeper).size && dropped == n - 1 &&
        last == truth(keeper).max)
    }
  }

  test("m12 frame-seq: trimmed-tail clip matches, disjoint clip doesn't") {
    // two payloads equal through the first 3 sampled windows but with
    // different tails must match (>=3 of 4 positions); an unrelated
    // payload of the same length must not
    val a = ("ab" * 200) + ("t1" * 20)      // 440 chars
    val b = ("ab" * 200) + ("zz" * 20)      // same head, different tail
    val c = ("qw" * 220)                    // disjoint content, same len
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val media = asMediaRecords(df, "doc_id", "text", "doc")
    val sigs = sampleWindows(media, 4, 12)
      .select(col("media_id"), posexplode(col("windows")).as(Seq("pos", "w")))
      .select(col("media_id"), col("pos"), md5(col("w")).as("fh"))
      .as[(Long, Int, String)].collect()
    val byMedia = sigs.groupBy(_._1).view.mapValues(
      _.map(t => t._2 -> t._3).toMap).toMap
    val matched12 = (0 until 4).count(p => byMedia(1L)(p) == byMedia(2L)(p))
    val matched13 = (0 until 4).count(p => byMedia(1L)(p) == byMedia(3L)(p))
    assert(matched12 >= 3, s"shared-head clips matched only $matched12/4")
    assert(matched13 == 0, "disjoint clips must share no sampled frame")
    // and the corpus-level operator has the declared shape
    val out = graft.queries.MultimodalQueries
      .queries("m12_frame_seq_neardup")(spark, sfDir)
    assert(out.columns.toSeq ==
      Seq("media_a", "media_b", "n_frames_matched"))
  }
}
