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

    // Patch-level dedup (duplicate-frame detection): tile each payload
    // into fixed 32-byte patches, hash each, and report per-media patch
    // counts, within-media distinct patches, and patches SHARED with
    // another media (the cross-corpus signal a video pipeline uses to drop
    // duplicated frames/stills). The patch explosion is pipeline-local;
    // the cross-corpus step shuffles one 16-byte hash per patch — never
    // payload bytes — and at 100 TB the hash table is the only thing that
    // moves.
    "m4_patch_dedup" -> ((s, d) => {
      val media = asMediaRecords(Tables.documents(s, d), "doc_id", "text", "doc")
      val patches = media
        .select(col("media_id"),
          explode(expr("sequence(0L, (byte_len - 1) DIV 32)")).as("pidx"),
          col("payload"))
        .select(col("media_id"),
          md5(expr("substring(payload, CAST(pidx * 32 + 1 AS INT), 32)"))
            .as("ph"))
      val perMedia = patches.groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_patches"),
          countDistinct(col("ph")).as("n_distinct"))
      val global = patches.groupBy(col("ph"))
        .agg(countDistinct(col("media_id")).as("nm"))
      val shared = patches.select(col("media_id"), col("ph")).distinct()
        .join(global.filter(col("nm") >= 2), "ph")
        .groupBy(col("media_id")).agg(count(lit(1)).as("n_shared"))
      perMedia.join(shared, Seq("media_id"), "left")
        .select(col("media_id"), col("n_patches"), col("n_distinct"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"))
        .orderBy(col("media_id"))
    }),

    // Cross-media near-dup PAIRS by shared patches — m4 scores each medium,
    // this names who copied whom (re-encoded frames, cropped images, quoted
    // clips share tiles even when whole-payload hashes differ). Skew
    // guard: patches shared by >16 media are dropped before pairing
    // (constant tiles — black frames, silence — would pair everything;
    // the m-family analog of d5's salted bands), so per-patch fan-out is
    // capped at C(16,2) pairs. Verdict = ≥3 distinct shared patches.
    "m5_shared_patches" -> ((s, d) => {
      val media = asMediaRecords(Tables.documents(s, d), "doc_id", "text", "doc")
      val patches = media
        .select(col("media_id"),
          explode(expr("sequence(0L, (byte_len - 1) DIV 32)")).as("pidx"),
          col("payload"))
        .select(col("media_id"),
          md5(expr("substring(payload, CAST(pidx * 32 + 1 AS INT), 32)"))
            .as("ph"))
        .distinct()
      val df = patches.groupBy(col("ph")).agg(count(lit(1)).as("nm"))
      val rare = patches.join(df.filter(col("nm").between(2, 16)), "ph")
      rare.select(col("ph"), col("media_id").as("media_a"))
        .join(rare.select(col("ph"), col("media_id").as("media_b")), "ph")
        .filter(col("media_a") < col("media_b"))
        .groupBy(col("media_a"), col("media_b"))
        .agg(count(lit(1)).as("n_shared_patches"))
        .filter(col("n_shared_patches") >= 3)
        .orderBy(col("media_a"), col("media_b"))
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
    }),

    // Modality-mix accounting — q72's media counterpart: per modality
    // (deterministic doc_id%3 split stands in for a real kind column),
    // media count, byte totals, byte share in ppm, and a token-equivalent
    // budget under fixed per-modality rates (≈4 bytes/text-token; images
    // cost a fixed patch-grid floor + bytes/1024; audio ≈320 bytes/frame
    // — illustrative constants, the CASE is the shape). One combinable
    // agg + a broadcast scalar; the report a mixture planner reads before
    // allocating a multimodal token budget.
    "m7_modality_mix" -> ((s, d) => {
      val media = Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id").as("media_id"),
          expr("CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image' " +
            "ELSE 'audio' END").as("kind"),
          length(col("text").cast("binary")).cast("long").as("byte_len"))
      val agg = media.groupBy(col("kind"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("byte_len")).as("total_bytes"),
          sum(expr("CASE kind WHEN 'text' THEN byte_len div 4 " +
            "WHEN 'image' THEN 256 + byte_len div 1024 " +
            "ELSE byte_len div 320 END")).as("token_equiv"))
      val tot = agg.agg(sum(col("total_bytes")).as("all_bytes"))
      agg.crossJoin(broadcast(tot))
        .select(col("kind"), col("n_media"), col("total_bytes"),
          expr("total_bytes * 1000000L div all_bytes").as("byte_share_ppm"),
          col("token_equiv"))
        .orderBy(col("kind"))
    }),

    // Interleaved multimodal sequence packing — t15's prefix-sum shard
    // assignment applied to a MIXED text/image/audio stream, with each
    // item costed at m7's per-modality token-equivalent rate (a training
    // loader packs heterogeneous items into fixed token-budget
    // sequences; the mix per shard is what a curriculum designer
    // audits). Per (lang, shard): item count, per-modality counts,
    // token total, and the id span. Conservation (Σ shard tok_total ≡
    // corpus token_equiv — no item dropped or double-packed, the p5
    // discipline) is asserted in `MultimodalSpec`. Scale shape = t15's:
    // the running sum partitions by lang, so no global single-partition
    // window; the per-shard collapse is one combinable agg on the same
    // key prefix.
    "m9_interleaved_pack" -> ((s, d) => {
      packedMedia(s, d)
        .groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("n_media"),
          sum(when(col("kind") === "text", 1L).otherwise(0L)).as("n_text"),
          sum(when(col("kind") === "image", 1L).otherwise(0L)).as("n_image"),
          sum(when(col("kind") === "audio", 1L).otherwise(0L)).as("n_audio"),
          sum(col("token_equiv")).as("tok_total"),
          min(col("media_id")).as("first_media"),
          max(col("media_id")).as("last_media"))
        .orderBy(col("lang"), col("shard"))
    }),

    // Perceptual-hash near-dup for binary payloads — image dedup gets
    // the same banded-not-all-pairs story text has (d5): an aHash-style
    // 32-bit fingerprint with one bit per fixed tile of the payload
    // (bit_i = MSB of md5(tile_i)), so a local edit flips only the bits
    // of the tiles it touches and re-encoded/lightly-edited payloads of
    // the same length land within small Hamming distance. Candidate
    // generation and skew-salted pairing reuse d5's machinery verbatim
    // ([[graft.ops.DedupOps.simhashBands]]/[[graft.ops.DedupOps.simhashPairs]]:
    // 4×8-bit bands guarantee recall at Hamming ≤ 3 by pigeonhole) — at
    // 100 TB only 4-byte fingerprints shuffle, never payload bytes, and
    // a hot band bucket triangle-salts across the cluster instead of
    // enumerating n² pairs in one task.
    "m10_phash_neardup" -> ((s, d) => {
      phashPairs(s, d)
        .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
          col("hamming"))
        .orderBy(col("media_a"), col("media_b"))
    }),

    // Image near-dup COLLAPSE end-to-end — m10 names the colliding
    // pairs; this finishes the job the way the text side does
    // (d7's star-CC + min-id canonical keeper, the d40 readout): the
    // Hamming≤3 pair graph collapses to components, the minimum
    // media_id in each cluster is the keeper, and the readout per
    // collapsed cluster is what a storage planner acts on — members
    // dropped and payload bytes reclaimed. Scale shape: the pair graph
    // is m10's (4-byte fingerprints shuffle, payloads never move);
    // star-CC ships one (doc, label) row per round with no |V|-row
    // label broadcast; the byte join touches only clustered media.
    "m11_phash_collapse" -> ((s, d) => {
      val media = asMediaRecords(Tables.documents(s, d), "doc_id", "text", "doc")
      val pairs = phashPairs(s, d).select(col("doc_a"), col("doc_b"))
      val labels = graft.ops.DedupOps.starComponents(pairs,
        media.select(col("media_id").as("doc_id")))
      labels.join(media.select(col("media_id").as("doc_id"),
          col("byte_len")), "doc_id")
        .groupBy(col("canon_id").as("keeper_id"))
        .agg(count(lit(1)).as("n_media"),
          (count(lit(1)) - 1L).as("n_dropped"),
          sum(when(col("doc_id") =!= col("canon_id"), col("byte_len"))
            .otherwise(0L)).as("bytes_reclaimed"),
          max(col("doc_id")).as("last_member"))
        .filter(col("n_media") >= 2)
        .orderBy(col("keeper_id"))
    }),

    // Sampled-frame-sequence near-dup for video payloads — the TEMPORAL
    // twin of m10's spatial tile hash: m2's 4 evenly-spaced byte windows
    // act as sampled frames, each hashed to a (position, frame-hash)
    // signature, and two media match when ≥3 of 4 POSITIONS agree —
    // re-containered/tail-corrupted clips keep most sampled frames at
    // the same relative offsets while whole-payload checksums diverge.
    // Positional join (pos, fh) with m5's hot-key guard: a frame hash
    // shared by >16 media at one position (black frames, silence) is
    // dropped before pairing, capping per-key fan-out at C(16,2). The
    // corpus has no organic same-length near-dups, so every 29th doc
    // plants a SAME-LENGTH twin with its last fifth overwritten (the
    // d23b planted-twin discipline: the scenario is a knob, the
    // positional-match arithmetic is the operator under test).
    "m12_frame_seq_neardup" -> ((s, d) => {
      val base = Tables.documents(s, d)
      // Plant only where the window geometry GUARANTEES detection: the
      // twin overwrites the last fifth, so windows 0..2 (stride =
      // len div 4, width 12) must lie entirely inside the unchanged
      // prefix — 2·stride + 12 ≤ len − len div 5. Short docs where the
      // stride degenerates (windows overlapping the overwritten tail
      // would match < 3 positions and silently vanish) are skipped
      // rather than planted-and-lost, keeping the "every planted twin
      // is detected" intent exact at any corpus size.
      val twins = base.filter(col("doc_id") % 29 === 0 &&
          expr("2 * greatest(length(text) div 4, 1) + 12 <= " +
            "length(text) - length(text) div 5"))
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("""concat(substring(text, 1, length(text) -
                |          length(text) div 5),
                |        repeat('z', length(text) div 5))""".stripMargin)
            .as("text"))
      val media = asMediaRecords(
        base.select(col("doc_id"), col("text")).unionByName(twins),
        "doc_id", "text", "doc")
      val sigs = sampleWindows(media, 4, 12)
        .select(col("media_id"), posexplode(col("windows"))
          .as(Seq("pos", "win")))
        .select(col("media_id"), col("pos").cast("long").as("pos"),
          md5(col("win")).as("fh"))
      val hot = sigs.groupBy(col("pos"), col("fh"))
        .agg(count(lit(1)).as("nm"))
      val rare = sigs.join(hot.filter(col("nm").between(2, 16)),
        Seq("pos", "fh"))
      rare.select(col("pos"), col("fh"), col("media_id").as("media_a"))
        .join(rare.select(col("pos"), col("fh"),
          col("media_id").as("media_b")), Seq("pos", "fh"))
        .filter(col("media_a") < col("media_b"))
        .groupBy(col("media_a"), col("media_b"))
        .agg(count(lit(1)).as("n_frames_matched"))
        .filter(col("n_frames_matched") >= 3)
        .orderBy(col("media_a"), col("media_b"))
    }),

    // Decoded-feature quality gate — the LAION/DataComp image-filter
    // shape (Schuhmann et al. 2021 keep an image iff its decoded
    // dimensions clear floors and its aspect ratio is sane; DataComp
    // inherits the same rules): width/height/frame-count come from the
    // typed mapPartitions decode path ([[MultimodalOps.decodeStub]] —
    // deterministic fake features, so SQL specifies them exactly and
    // the oracle gates the real imperative plumbing), verdicts are
    // integer comparisons (min-side ≥ 128 px, aspect within 3:1 both
    // ways, ≥ 4 frames). Per media: features + per-rule verdicts +
    // keep. Scale shape: one decode pass, one codegen'd projection —
    // embarrassingly parallel, no shuffle at all before the output sort.
    "m15_media_quality_gate" -> ((s, d) => {
      val media = asMediaRecords(Tables.documents(s, d), "doc_id", "text", "doc")
      decodeStub(s, media).toDF()
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"))
        .withColumn("size_ok", least(col("width"), col("height")) >= 128L)
        .withColumn("aspect_ok",
          col("width") * 100L <= col("height") * 300L &&
            col("height") * 100L <= col("width") * 300L)
        .withColumn("frames_ok", col("n_frames") >= 4L)
        .withColumn("keep",
          col("size_ok") && col("aspect_ok") && col("frames_ok"))
        .orderBy(col("media_id"))
    }),

    // Static-clip detection — the frame-DIVERSITY signal a video
    // curation pipeline drops screensaver/slate clips with: m2's 4
    // evenly-spaced sampled frames hash to fingerprints, and a clip
    // whose samples collapse to ≤2 distinct frames is flagged static
    // (near-zero temporal information; its tokens-per-byte value is
    // that of a single image). The corpus has no organic static clips,
    // so every 31st doc plants one (text = a 16-char slice repeated —
    // the window stride is a multiple of the period, so all 4 sampled
    // frames are byte-identical; the m12/d23b planted-twin discipline).
    // Per media: distinct sampled frames, dominant-frame count, the
    // static verdict. Scale shape: 4 16-byte hashes per media through
    // one per-media agg — payload bytes never shuffle.
    "m16_static_clip" -> ((s, d) => {
      val base = Tables.documents(s, d)
      val planted = base.filter(col("doc_id") % 31 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("repeat(substring(text, 1, 16), 8)").as("text"))
      val media = asMediaRecords(
        base.select(col("doc_id"), col("text")).unionByName(planted),
        "doc_id", "text", "doc")
      sampleWindows(media, 4, 12)
        .select(col("media_id"), explode(col("windows")).as("win"))
        .select(col("media_id"), md5(col("win")).as("fh"))
        .groupBy(col("media_id"), col("fh"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_distinct"),
          max(col("cnt")).as("dom_count"))
        .withColumn("is_static", col("n_distinct") <= 2L)
        .orderBy(col("media_id"))
    }),

    // Cross-modal CONSISTENCY audit — do the caption-side and the
    // payload-side near-dup signals agree? Text near-dup membership
    // comes from the persisted DedupIndex star forest (d7's canonical
    // labels, the d21/d27 serve discipline); payload membership from
    // m11's phash components. Per doc: both flags plus the verdict
    // ('both' / 'caption_only' / 'payload_only' / 'neither') — the
    // disagreement classes are exactly the media a multimodal curation
    // run routes to review (caption copied under a new image, image
    // re-encoded under a new caption). Scale shape: two (id, flag)
    // frames joined on doc_id — no payload or token bytes move.
    //
    // The membership flags are DEGREE tests, not component readouts: a
    // node sits in a ≥2-member component iff it has ≥1 incident edge
    // (any co-member implies a path, hence an incident edge; any edge
    // implies a co-member), so the payload flag is "appears as an
    // endpoint of a verified phash pair" — the star-CC loop an earlier
    // revision ran per invocation (~2 s of iterative rounds at sf0.1)
    // computed labels this query then collapsed back to that boolean.
    // m11/m12 still run the real collapse (they consume the labels);
    // the audit only needs the degree bit. Same rows, same oracle.
    "m17_crossmodal_consistency" -> ((s, d) => {
      val docsDf = Tables.documents(s, d)
      val tCanon = graft.ops.DedupIndex.canonicalDf(s,
        graft.ops.DedupIndex.ensure(s, d))
      // star-forest degree test: non-root ⇒ dup; a root is a dup iff it
      // has a child (appears as someone else's canon_id)
      val tParents = tCanon.filter(col("canon_id") =!= col("doc_id"))
        .select(col("canon_id").as("doc_id")).distinct()
        .withColumn("has_child", lit(true))
      val tFlag = tCanon
        .join(tParents, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("canon_id") =!= col("doc_id") ||
            coalesce(col("has_child"), lit(false))).as("t_dup"))
      val media = asMediaRecords(docsDf, "doc_id", "text", "doc")
      val pEnds = phashPairs(s, d)
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct().withColumn("has_pair", lit(true))
      val pFlag = media.select(col("media_id").as("doc_id"))
        .join(pEnds, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("has_pair"), lit(false)).as("p_dup"))
      tFlag.join(pFlag, "doc_id")
        .withColumn("verdict", expr(
          """CASE WHEN t_dup AND p_dup THEN 'both'
            |     WHEN t_dup THEN 'caption_only'
            |     WHEN p_dup THEN 'payload_only'
            |     ELSE 'neither' END""".stripMargin))
        .select(col("doc_id"), col("t_dup"), col("p_dup"), col("verdict"))
        .orderBy(col("doc_id"))
    }),

    // Modality CURRICULUM over m9's packed sequences — t42's curriculum
    // logic reused on the multimodal frame: each packed sequence's
    // difficulty is its NON-TEXT token share (ppm — curriculum designers
    // schedule text-heavy sequences first and dense multimodal ones
    // later), bins come from decile boundaries of a bounded md5-decided
    // reservoir over the sequences (q91/t42's discipline: ≤640 rows
    // through the rank window, never an ntile over the corpus; ≤9 longs
    // reach the driver), and the readout per bin is what the scheduler
    // consumes: sequence count, item volume, token volume, difficulty
    // span. Scale shape: one per-lang packing window (m9's), one
    // (lang, shard) agg, the bounded reservoir, then a literal-probe
    // bin projection — no corpus-wide sort anywhere.
    "m14_modality_curriculum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val sh = packedMedia(s, d)
        .groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("token_equiv")).as("tok_total"),
          sum(when(col("kind") =!= "text", col("token_equiv"))
            .otherwise(0L)).as("nontext_tok"))
        .withColumn("diff_ppm",
          expr("nontext_tok * 1000000 div greatest(tok_total, 1)"))
        .transform(graft.Tables.stage) // sampled AND binned below
      val smp = sh.withColumn("h", graft.ops.TextOps.hash60(
          concat(lit("m14|"), col("lang"), lit("|"),
            col("shard").cast("string"))))
        .withColumn("brn", row_number().over(
          Window.partitionBy(col("h") % 32)
            .orderBy(col("h"), col("lang"), col("shard"))))
        .filter(col("brn") <= 20)
      val rk = smp.withColumn("rn", row_number().over(
        Window.orderBy(col("diff_ppm"), col("lang"), col("shard"))))
      val ns = rk.count() // ≤640 by construction — q91's bounded sample
      val bounds = rk
        .join(broadcast(s.range(1, 10).select(
          expr(s"(id * ${ns}L) div 10").as("pos"))),
          col("rn") === col("pos"))
        .filter(col("pos") >= 1)
        .select(col("diff_ppm")).as[Long]
        .collect().sorted.toSeq // ≤9 longs on the driver (q91's budget)
      val binExpr = bounds.map(b =>
        when(col("diff_ppm") > lit(b), 1L).otherwise(0L))
        .reduceOption[org.apache.spark.sql.Column](_ + _)
        .getOrElse(lit(0L))
      sh.withColumn("bin", binExpr)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_shards"),
          sum(col("n_media")).as("n_media"),
          sum(col("tok_total")).as("tok_total"),
          min(col("diff_ppm")).as("min_diff_ppm"),
          max(col("diff_ppm")).as("max_diff_ppm"))
        .orderBy(col("bin"))
    })
  )

  /** m9/m14's shared packed-item frame: each media item costed at m7's
    * per-modality token-equivalent rate and assigned a fixed-budget
    * sequence (shard) by t15's per-lang prefix-sum packing — the running
    * sum partitions by lang, so no global single-partition window. */
  private def packedMedia(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val media = Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id").as("media_id"), col("lang"),
        expr("CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image' " +
          "ELSE 'audio' END").as("kind"),
        length(col("text").cast("binary")).cast("long").as("byte_len"))
      .withColumn("token_equiv",
        expr("CASE kind WHEN 'text' THEN byte_len div 4 " +
          "WHEN 'image' THEN 256 + byte_len div 1024 " +
          "ELSE byte_len div 320 END"))
    val w = Window.partitionBy(col("lang")).orderBy(col("media_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    media
      .withColumn("prefix_toks",
        coalesce(sum(col("token_equiv")).over(w), lit(0L)))
      .withColumn("shard", expr("prefix_toks div 2048"))
  }

  /** m10/m11's shared pair kernel: the aHash-style 32-bit payload
    * fingerprint (bit_i = MSB of md5(tile_i), tiles = byte_len/32-wide
    * fixed grid) banded and skew-salted through d5's machinery — emits
    * the verified Hamming≤3 candidate pairs as (doc_a, doc_b, hamming). */
  private def phashPairs(s: SparkSession, d: String): DataFrame = {
    val media = asMediaRecords(Tables.documents(s, d), "doc_id", "text", "doc")
    val ph = media
      .withColumn("tw", greatest(expr("byte_len div 32"), lit(1L)))
      .withColumn("phash", phash32)
      .select(col("media_id").as("doc_id"), col("phash"))
    graft.ops.DedupOps.simhashPairs(
      graft.ops.DedupOps.simhashBands(ph, col("phash")), 3)
  }

  /** DuckDB can't slice BLOBs (`substring(BLOB, …)` doesn't bind), so the
    * m-oracles slice TEXT by characters while Spark slices the encoded
    * payload by bytes. That equivalence holds only for ASCII corpora — so
    * instead of assuming it, every slicing oracle reads `documents` through
    * this CTE, which `error()`s LOUDLY at gate time on the first non-ASCII
    * doc rather than silently hash-diverging. (The empty-payload corner is
    * engine-consistent without a guard: both Spark's `DIV` and DuckDB's
    * `//` truncate toward zero, so byte_len = 0 yields the single
    * `md5('')` patch in both engines.) */
  private val dkAsciiGuard =
    """ascii_docs AS (
      |  SELECT doc_id,
      |    CASE WHEN octet_length(encode(text)) = length(text) THEN text
      |         ELSE error('m-oracle: non-ASCII doc ' || doc_id ||
      |                    ' breaks char=byte slice equivalence') END AS text
      |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "m7_modality_mix" ->
      s"""WITH $dkAsciiGuard,
         |media AS (
         |  SELECT doc_id AS media_id,
         |    CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image'
         |         ELSE 'audio' END AS kind,
         |    octet_length(encode(text)) AS byte_len
         |  FROM ascii_docs),
         |agg AS (
         |  SELECT kind, COUNT(*) AS n_media,
         |    CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
         |    CAST(SUM(CASE kind WHEN 'text' THEN byte_len // 4
         |      WHEN 'image' THEN 256 + byte_len // 1024
         |      ELSE byte_len // 320 END) AS BIGINT) AS token_equiv
         |  FROM media GROUP BY kind),
         |tot AS (SELECT CAST(SUM(total_bytes) AS BIGINT) AS all_bytes FROM agg)
         |SELECT kind, n_media, total_bytes,
         |  (total_bytes * 1000000) // all_bytes AS byte_share_ppm,
         |  token_equiv
         |FROM agg CROSS JOIN tot ORDER BY kind""".stripMargin,
    "m1_binary_meta" ->
      s"""WITH $dkAsciiGuard
        |SELECT doc_id AS media_id, 'doc' AS kind,
        |  octet_length(encode(text)) AS byte_len,
        |  md5(text) AS checksum,
        |  base64(encode(substring(text, 1, 8))) AS head_b64
        |FROM ascii_docs ORDER BY media_id""".stripMargin,
    // Window starts mirror MultimodalOps.sampleWindows: 1 + i*(len DIV 4)
    "m2_frame_windows" -> {
      val win = (0 until 4).map(i =>
        s"base64(encode(substring(text, 1 + $i * greatest(octet_length(encode(text)) // 4, 1), 12)))")
        .mkString(",\n        ")
      s"""WITH $dkAsciiGuard
         |SELECT doc_id AS media_id,
         |  octet_length(encode(text)) AS byte_len,
         |  concat_ws('|',
         |        $win) AS windows_b64
         |FROM ascii_docs ORDER BY media_id""".stripMargin
    },
    // mirrors MultimodalOps.decodeStub: ub(i) = i-th md5 digest byte
    "m3_decode_features" ->
      """SELECT doc_id AS media_id, 'doc' AS kind,
        |  octet_length(encode(text)) AS byte_len,
        |  CAST(16 * (1 + ('0x' || substr(md5(text), 1, 2))::INT % 64) AS BIGINT) AS width,
        |  CAST(16 * (1 + ('0x' || substr(md5(text), 3, 2))::INT % 64) AS BIGINT) AS height,
        |  CAST(1 + ('0x' || substr(md5(text), 5, 2))::INT % 30 AS BIGINT) AS n_frames,
        |  md5(text) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin,
    // char-slicing == byte-slicing enforced by the ascii_docs guard CTE
    "m4_patch_dedup" ->
      s"""WITH $dkAsciiGuard,
        |p AS (
        |  SELECT doc_id AS media_id, text,
        |    unnest(generate_series(0, (octet_length(encode(text)) - 1) // 32))
        |      AS pidx
        |  FROM ascii_docs),
        |h AS (SELECT media_id, md5(substring(text, pidx * 32 + 1, 32)) AS ph
        |      FROM p),
        |g AS (SELECT ph, count(DISTINCT media_id) AS nm FROM h GROUP BY ph),
        |dm AS (SELECT DISTINCT media_id, ph FROM h),
        |m AS (SELECT media_id, count(*) AS n_patches,
        |             count(DISTINCT ph) AS n_distinct
        |      FROM h GROUP BY 1),
        |s AS (SELECT dm.media_id, count(*) AS n_shared
        |      FROM dm JOIN g ON dm.ph = g.ph WHERE g.nm >= 2 GROUP BY 1)
        |SELECT m.media_id, m.n_patches, m.n_distinct,
        |       coalesce(s.n_shared, 0) AS n_shared
        |FROM m LEFT JOIN s USING (media_id) ORDER BY media_id""".stripMargin,
    // byte_len = UTF-8 byte length on both sides (octet_length(encode())
    // vs length(cast binary)) — exact without the ascii guard; nothing
    // here slices.
    "m9_interleaved_pack" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id, lang,
        |    CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image'
        |         ELSE 'audio' END AS kind,
        |    octet_length(encode(text)) AS byte_len
        |  FROM documents),
        |tok AS (
        |  SELECT media_id, lang, kind,
        |    CASE kind WHEN 'text' THEN byte_len // 4
        |      WHEN 'image' THEN 256 + byte_len // 1024
        |      ELSE byte_len // 320 END AS token_equiv
        |  FROM media),
        |pre AS (
        |  SELECT media_id, lang, kind, token_equiv,
        |    CAST(coalesce(SUM(token_equiv) OVER (PARTITION BY lang
        |      ORDER BY media_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS prefix_toks
        |  FROM tok)
        |SELECT lang, prefix_toks // 2048 AS shard, COUNT(*) AS n_media,
        |  CAST(SUM(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_text,
        |  CAST(SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_image,
        |  CAST(SUM(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_audio,
        |  CAST(SUM(token_equiv) AS BIGINT) AS tok_total,
        |  MIN(media_id) AS first_media, MAX(media_id) AS last_media
        |FROM pre GROUP BY lang, shard ORDER BY lang, shard""".stripMargin,
    // tile slicing needs char=byte equivalence → ascii guard; the
    // first-matching-band ownership on the Spark side and DISTINCT here
    // both reduce to "each colliding pair exactly once"
    "m10_phash_neardup" ->
      s"""WITH $dkAsciiGuard,
        |m AS (
        |  SELECT doc_id AS media_id, text,
        |    greatest(octet_length(encode(text)) // 32, 1) AS tw
        |  FROM ascii_docs),
        |ph AS (
        |  SELECT media_id,
        |    CAST(list_sum(list_transform(generate_series(0, 31), i ->
        |      CASE WHEN substr(md5(substring(text,
        |             CAST(i * tw + 1 AS INT), CAST(tw AS INT))), 1, 1) >= '8'
        |           THEN (CAST(1 AS BIGINT) << i) ELSE 0 END))
        |      AS BIGINT) AS phash
        |  FROM m),
        |bands AS (
        |  SELECT media_id, phash, b.band_idx,
        |         (phash >> (b.band_idx * 8)) & 255 AS band_val
        |  FROM ph, (SELECT unnest([0,1,2,3]) AS band_idx) b),
        |cand AS (
        |  SELECT DISTINCT l.media_id AS media_a, r.media_id AS media_b,
        |         l.phash AS ph_a, r.phash AS ph_b
        |  FROM bands l JOIN bands r
        |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
        |   AND l.media_id < r.media_id)
        |SELECT media_a, media_b,
        |  bit_count(xor(ph_a, ph_b))::BIGINT AS hamming
        |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 3
        |ORDER BY media_a, media_b""".stripMargin,
    // m10's CTEs through the verified pair list, then the d7 oracle
    // pattern: recursive reachability closure + min-reach canonical +
    // per-cluster byte accounting (HAVING >= 2 mirrors the Spark filter)
    "m11_phash_collapse" ->
      s"""WITH RECURSIVE $dkAsciiGuard,
        |m AS (
        |  SELECT doc_id AS media_id, text,
        |    octet_length(encode(text)) AS byte_len,
        |    greatest(octet_length(encode(text)) // 32, 1) AS tw
        |  FROM ascii_docs),
        |ph AS (
        |  SELECT media_id,
        |    CAST(list_sum(list_transform(generate_series(0, 31), i ->
        |      CASE WHEN substr(md5(substring(text,
        |             CAST(i * tw + 1 AS INT), CAST(tw AS INT))), 1, 1) >= '8'
        |           THEN (CAST(1 AS BIGINT) << i) ELSE 0 END))
        |      AS BIGINT) AS phash
        |  FROM m),
        |bands AS (
        |  SELECT media_id, phash, b.band_idx,
        |         (phash >> (b.band_idx * 8)) & 255 AS band_val
        |  FROM ph, (SELECT unnest([0,1,2,3]) AS band_idx) b),
        |jp AS (
        |  SELECT DISTINCT l.media_id AS media_a, r.media_id AS media_b
        |  FROM bands l JOIN bands r
        |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
        |   AND l.media_id < r.media_id
        |  WHERE bit_count(xor(l.phash, r.phash)) <= 3),
        |edges AS (
        |  SELECT media_a AS src, media_b AS dst FROM jp
        |  UNION ALL SELECT media_b, media_a FROM jp),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |canon AS (
        |  SELECT m.media_id,
        |    least(m.media_id, coalesce(min(r.dst), m.media_id)) AS canon_id
        |  FROM m LEFT JOIN reach r ON r.src = m.media_id
        |  GROUP BY m.media_id)
        |SELECT c.canon_id AS keeper_id, COUNT(*) AS n_media,
        |  COUNT(*) - 1 AS n_dropped,
        |  CAST(SUM(CASE WHEN c.media_id <> c.canon_id THEN m.byte_len
        |           ELSE 0 END) AS BIGINT) AS bytes_reclaimed,
        |  MAX(c.media_id) AS last_member
        |FROM canon c JOIN m USING (media_id)
        |GROUP BY c.canon_id HAVING COUNT(*) >= 2
        |ORDER BY keeper_id""".stripMargin,
    // window starts mirror m2's sampleWindows formula; md5 of the same
    // 12-char/byte slice on both sides under the ascii guard; the
    // planted same-length tail-overwrite twins mirror the Spark union
    "m12_frame_seq_neardup" ->
      s"""WITH $dkAsciiGuard,
        |feed AS (
        |  SELECT doc_id, text FROM ascii_docs
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    substring(text, 1, length(text) - length(text) // 5) ||
        |      repeat('z', length(text) // 5)
        |  FROM ascii_docs WHERE doc_id % 29 = 0
        |    AND 2 * greatest(length(text) // 4, 1) + 12 <=
        |        length(text) - length(text) // 5),
        |w AS (
        |  SELECT doc_id AS media_id, CAST(b.i AS BIGINT) AS pos,
        |    md5(substring(text,
        |      1 + b.i * greatest(octet_length(encode(text)) // 4, 1), 12))
        |      AS fh
        |  FROM feed, (SELECT unnest([0,1,2,3]) AS i) b),
        |hot AS (SELECT pos, fh, count(*) AS nm FROM w GROUP BY pos, fh),
        |rare AS (SELECT w.media_id, w.pos, w.fh FROM w
        |         JOIN hot USING (pos, fh) WHERE nm BETWEEN 2 AND 16)
        |SELECT a.media_id AS media_a, b.media_id AS media_b,
        |       count(*) AS n_frames_matched
        |FROM rare a JOIN rare b
        |  ON a.pos = b.pos AND a.fh = b.fh AND a.media_id < b.media_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY media_a, media_b""".stripMargin,
    // m3's decode-stub feature mirror + the same integer rule battery
    "m15_media_quality_gate" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |    CAST(16 * (1 + ('0x' || substr(md5(text), 1, 2))::INT % 64)
        |      AS BIGINT) AS width,
        |    CAST(16 * (1 + ('0x' || substr(md5(text), 3, 2))::INT % 64)
        |      AS BIGINT) AS height,
        |    CAST(1 + ('0x' || substr(md5(text), 5, 2))::INT % 30
        |      AS BIGINT) AS n_frames
        |  FROM documents)
        |SELECT media_id, width, height, n_frames,
        |  least(width, height) >= 128 AS size_ok,
        |  (width * 100 <= height * 300 AND height * 100 <= width * 300)
        |    AS aspect_ok,
        |  n_frames >= 4 AS frames_ok,
        |  (least(width, height) >= 128
        |   AND width * 100 <= height * 300 AND height * 100 <= width * 300
        |   AND n_frames >= 4) AS keep
        |FROM f ORDER BY media_id""".stripMargin,
    // m2's window formula over the planted feed (repeat-period text —
    // stride a multiple of the period, so samples collapse), then the
    // two-level distinct/dominant agg.
    "m16_static_clip" ->
      s"""WITH $dkAsciiGuard,
        |feed AS (
        |  SELECT doc_id, text FROM ascii_docs
        |  UNION ALL
        |  SELECT doc_id + 2000000, repeat(substring(text, 1, 16), 8)
        |  FROM ascii_docs WHERE doc_id % 31 = 0),
        |w AS (
        |  SELECT doc_id AS media_id,
        |    md5(substring(text,
        |      1 + b.i * greatest(octet_length(encode(text)) // 4, 1), 12))
        |      AS fh
        |  FROM feed, (SELECT unnest([0,1,2,3]) AS i) b),
        |c AS (SELECT media_id, fh, count(*) AS cnt FROM w GROUP BY 1, 2)
        |SELECT media_id, CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(max(cnt) AS BIGINT) AS dom_count,
        |  count(*) <= 2 AS is_static
        |FROM c GROUP BY media_id ORDER BY media_id""".stripMargin,
    // BOTH closures from scratch in one statement (the d46 fresh-names
    // discipline: the text side keeps d7's CTE names, the payload side
    // is p-prefixed), then the per-side size flags and the CASE verdict.
    // The Spark side serves the text labels from the persisted
    // DedupIndex — byte-equality here proves the served forest matches
    // the from-scratch closure, the d21/d27 contract.
    "m17_crossmodal_consistency" ->
      s"""${DedupQueries.dkSimhashClosureCtes},
        |$dkAsciiGuard,
        |pm AS (
        |  SELECT doc_id AS media_id, text,
        |    greatest(octet_length(encode(text)) // 32, 1) AS tw
        |  FROM ascii_docs),
        |pph AS (
        |  SELECT media_id,
        |    CAST(list_sum(list_transform(generate_series(0, 31), i ->
        |      CASE WHEN substr(md5(substring(text,
        |             CAST(i * tw + 1 AS INT), CAST(tw AS INT))), 1, 1) >= '8'
        |           THEN (CAST(1 AS BIGINT) << i) ELSE 0 END))
        |      AS BIGINT) AS phash
        |  FROM pm),
        |pbands AS (
        |  SELECT media_id, phash, b.band_idx,
        |         (phash >> (b.band_idx * 8)) & 255 AS band_val
        |  FROM pph, (SELECT unnest([0,1,2,3]) AS band_idx) b),
        |pjp AS (
        |  SELECT DISTINCT l.media_id AS media_a, r.media_id AS media_b
        |  FROM pbands l JOIN pbands r
        |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
        |   AND l.media_id < r.media_id
        |  WHERE bit_count(xor(l.phash, r.phash)) <= 3),
        |pedges AS (
        |  SELECT media_a AS src, media_b AS dst FROM pjp
        |  UNION ALL SELECT media_b, media_a FROM pjp),
        |preach AS (
        |  SELECT src, dst FROM pedges
        |  UNION
        |  SELECT r.src, e.dst FROM preach r JOIN pedges e ON r.dst = e.src),
        |pcanon AS (
        |  SELECT d.doc_id,
        |    least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS canon_id
        |  FROM documents d LEFT JOIN preach r ON r.src = d.doc_id
        |  GROUP BY d.doc_id),
        |tsz AS (SELECT canon_id, count(*) AS tn FROM canon GROUP BY canon_id),
        |tflag AS (SELECT c.doc_id, s.tn >= 2 AS t_dup
        |          FROM canon c JOIN tsz s USING (canon_id)),
        |psz AS (SELECT canon_id, count(*) AS pn FROM pcanon GROUP BY canon_id),
        |pflag AS (SELECT c.doc_id, s.pn >= 2 AS p_dup
        |          FROM pcanon c JOIN psz s USING (canon_id))
        |SELECT t.doc_id, t.t_dup, p.p_dup,
        |  CASE WHEN t.t_dup AND p.p_dup THEN 'both'
        |       WHEN t.t_dup THEN 'caption_only'
        |       WHEN p.p_dup THEN 'payload_only'
        |       ELSE 'neither' END AS verdict
        |FROM tflag t JOIN pflag p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // m9's packing CTEs through the per-shard difficulty, then t42's
    // reservoir/decile/strict-less bin mirror on the shard frame.
    "m14_modality_curriculum" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id, lang,
        |    CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image'
        |         ELSE 'audio' END AS kind,
        |    octet_length(encode(text)) AS byte_len
        |  FROM documents),
        |tok AS (
        |  SELECT media_id, lang, kind,
        |    CASE kind WHEN 'text' THEN byte_len // 4
        |      WHEN 'image' THEN 256 + byte_len // 1024
        |      ELSE byte_len // 320 END AS token_equiv
        |  FROM media),
        |pre AS (
        |  SELECT media_id, lang, kind, token_equiv,
        |    CAST(coalesce(SUM(token_equiv) OVER (PARTITION BY lang
        |      ORDER BY media_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS prefix_toks
        |  FROM tok),
        |sh AS (
        |  SELECT lang, prefix_toks // 2048 AS shard,
        |    CAST(COUNT(*) AS BIGINT) AS n_media,
        |    CAST(SUM(token_equiv) AS BIGINT) AS tok_total,
        |    CAST(SUM(CASE WHEN kind <> 'text' THEN token_equiv
        |             ELSE 0 END) AS BIGINT) AS nontext_tok
        |  FROM pre GROUP BY lang, shard),
        |df AS (
        |  SELECT lang, shard, n_media, tok_total,
        |    (nontext_tok * 1000000) // greatest(tok_total, 1) AS diff_ppm
        |  FROM sh),
        |hs AS (
        |  SELECT lang, shard, diff_ppm,
        |    ('0x' || substr(md5('m14|' || lang || '|' || shard), 1, 15))
        |      ::BIGINT AS h
        |  FROM df),
        |smp AS (
        |  SELECT lang, shard, diff_ppm FROM (
        |    SELECT lang, shard, diff_ppm,
        |      ROW_NUMBER() OVER (PARTITION BY h % 32
        |        ORDER BY h, lang, shard) AS brn
        |    FROM hs) WHERE brn <= 20),
        |rk AS (
        |  SELECT diff_ppm, ROW_NUMBER() OVER (
        |    ORDER BY diff_ppm, lang, shard) AS rn FROM smp),
        |ns AS (SELECT CAST(max(rn) AS BIGINT) AS ns FROM rk),
        |pos AS (
        |  SELECT (g.i * n.ns) // 10 AS pos
        |  FROM (SELECT unnest(generate_series(1, 9)) AS i) g, ns n),
        |bounds AS (
        |  SELECT rk.diff_ppm AS bval FROM pos p
        |  JOIN rk ON rk.rn = p.pos WHERE p.pos >= 1),
        |asg AS (
        |  SELECT d.bin, d.n_media, d.tok_total, d.diff_ppm FROM (
        |    SELECT df.*, (SELECT count(*) FROM bounds b
        |                  WHERE b.bval < df.diff_ppm) AS bin
        |    FROM df) d)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_shards,
        |  CAST(sum(n_media) AS BIGINT) AS n_media,
        |  CAST(sum(tok_total) AS BIGINT) AS tok_total,
        |  CAST(min(diff_ppm) AS BIGINT) AS min_diff_ppm,
        |  CAST(max(diff_ppm) AS BIGINT) AS max_diff_ppm
        |FROM asg GROUP BY bin ORDER BY bin""".stripMargin,
    "m5_shared_patches" ->
      s"""WITH $dkAsciiGuard,
        |p AS (
        |  SELECT doc_id AS media_id, text,
        |    unnest(generate_series(0, (octet_length(encode(text)) - 1) // 32))
        |      AS pidx
        |  FROM ascii_docs),
        |h AS (SELECT DISTINCT media_id,
        |             md5(substring(text, pidx * 32 + 1, 32)) AS ph
        |      FROM p),
        |g AS (SELECT ph, count(*) AS nm FROM h GROUP BY ph),
        |rare AS (SELECT h.media_id, h.ph FROM h
        |         JOIN g ON g.ph = h.ph AND g.nm BETWEEN 2 AND 16)
        |SELECT a.media_id AS media_a, b.media_id AS media_b,
        |       count(*) AS n_shared_patches
        |FROM rare a JOIN rare b
        |  ON a.ph = b.ph AND a.media_id < b.media_id
        |GROUP BY a.media_id, b.media_id
        |HAVING count(*) >= 3
        |ORDER BY media_a, media_b""".stripMargin
  )
}
