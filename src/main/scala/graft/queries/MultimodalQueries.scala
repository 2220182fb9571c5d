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
    })
  )

  /** m10/m11's shared pair kernel: the aHash-style 32-bit payload
    * fingerprint (bit_i = MSB of md5(tile_i), tiles = byte_len/32-wide
    * fixed grid) banded and skew-salted through d5's machinery — emits
    * the verified Hamming≤3 candidate pairs as (doc_a, doc_b, hamming). */
  private def phashPairs(s: SparkSession, d: String): DataFrame = {
    val media = asMediaRecords(Tables.documents(s, d), "doc_id", "text", "doc")
    val ph = media
      .withColumn("tw", greatest(expr("byte_len div 32"), lit(1L)))
      .withColumn("phash", expr(
        """aggregate(sequence(0, 31), 0L, (acc, i) ->
          |  acc + IF(substring(md5(substring(payload,
          |        CAST(i * tw + 1 AS INT), CAST(tw AS INT))), 1, 1) >= '8',
          |    shiftleft(1L, i), 0L))""".stripMargin))
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
