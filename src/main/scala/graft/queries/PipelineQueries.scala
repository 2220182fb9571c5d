package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed curation pipeline with its stage-boundary reconciliation
  * ledger — see [[graft.ops.CurationLedger]] for the chain and its
  * scale shape. The single query emits one row per stage with EXACT
  * integer (docs_in, docs_out, tokens_in, tokens_out); the DuckDB
  * oracle replays the entire chain (NB gate margins, MinHash-LSH
  * candidates, Jaccard verification, transitive-closure components,
  * Bloom decontamination, mixture rates, packing, chunking) and the
  * ledgers match bit-for-bit. The reconciliation contracts a reader
  * should check: normalize changes the token CURRENCY (raw→normalized)
  * but not the doc count (minus empty normal forms); pack conserves
  * tokens exactly; chunk inflates them by exactly the window overlap.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "p1_curation_ledger" -> ((s, d) => {
      val st = graft.ops.CurationLedger.stages(s, d)
      def cnt(df: DataFrame, tok: String): DataFrame =
        df.agg(count(lit(1)).as("dc"),
          coalesce(sum(col(tok)), lit(0L)).as("tc"))
      def row(id: Int, name: String, in: DataFrame, inTok: String,
          out: DataFrame, outTok: String): DataFrame =
        cnt(in, inTok).crossJoin(cnt(out, outTok).select(
            col("dc").as("dc2"), col("tc").as("tc2")))
          .select(lit(id.toLong).as("stage_id"), lit(name).as("stage"),
            col("dc").as("docs_in"), col("dc2").as("docs_out"),
            col("tc").as("tokens_in"), col("tc2").as("tokens_out"))
      val shards = graft.ops.CurationLedger.packShards(st.s6)
      val chunks = graft.ops.CurationLedger.chunkRows(st.s6)
      Seq(
        row(0, "ingest", st.raw, "ntok_raw", st.raw, "ntok_raw"),
        row(1, "normalize", st.raw, "ntok_raw", st.s1, "ntok"),
        row(2, "nb_gate", st.s1, "ntok", st.s2, "ntok"),
        row(3, "exact_dedup", st.s2, "ntok", st.s3, "ntok"),
        row(4, "neardup_collapse", st.s3, "ntok", st.s4, "ntok"),
        row(5, "decontaminate", st.s4, "ntok", st.s5, "ntok"),
        row(6, "mixture", st.s5, "ntok", st.s6, "ntok"),
        row(7, "pack", st.s6, "ntok", shards, "stoks"),
        row(8, "chunk", st.s6, "ntok", chunks, "ctoks")
      ).reduce(_ unionByName _).orderBy(col("stage_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "p1_curation_ledger" -> {
      import graft.queries.DedupQueries.{JaccardTau, dkMinhashCandCtes}
      val tau = JaccardTau
      val salts = graft.ops.CurationLedger.BloomSalts
      val bloomBits = graft.ops.CurationLedger.BloomBits
      def bitsSel(src: String, cols: String) = salts.map { k =>
        s"""SELECT $cols,
           |  ('0x' || substr(md5('$k|' || sh), 1, 15))::BIGINT % $bloomBits AS b
           |FROM $src""".stripMargin
      }.mkString("\n  UNION ALL\n")
      val toksOf = (c: String) => s"len(string_split_regex(trim($c), '\\s+'))"
      // The mg/shg/prs MATERIALIZED wrappers (and the MATERIALIZED stage
      // CTEs below) are load-bearing: each stage references its
      // predecessor 3+ times (survivor join + ledger counts), and
      // without materialization DuckDB re-inlines the ENTIRE upstream
      // chain per reference — exponentially many documents.parquet
      // scans, which exhausts the fd limit before it exhausts patience.
      s"""WITH RECURSIVE ${TextQueries.dkNbMarginCtes("TRUE")},
         |$dkMinhashCandCtes,
         |mg AS MATERIALIZED (SELECT * FROM marg),
         |shg AS MATERIALIZED (SELECT * FROM shingled),
         |prs AS MATERIALIZED (SELECT * FROM pairs),
         |nrm AS MATERIALIZED (
         |  SELECT doc_id, text, lang, source,
         |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]',
         |        ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
         |    ${toksOf("text")} AS ntok_raw
         |  FROM documents),
         |st1 AS MATERIALIZED (
         |  SELECT doc_id, text, lang, source, norm_text,
         |    ${toksOf("norm_text")} AS ntok
         |  FROM nrm WHERE length(norm_text) > 0),
         |st2 AS MATERIALIZED (
         |  SELECT st1.* FROM st1 JOIN mg USING (doc_id)
         |  WHERE mg.margin > 0),
         |k3 AS (SELECT md5(norm_text) AS h, min(doc_id) AS doc_id
         |       FROM st2 GROUP BY 1),
         |st3 AS MATERIALIZED (SELECT st2.* FROM st2 JOIN k3 USING (doc_id)),
         |ped AS (
         |  SELECT p.doc_a, p.doc_b FROM prs p
         |  JOIN st3 a3 ON a3.doc_id = p.doc_a
         |  JOIN st3 b3 ON b3.doc_id = p.doc_b),
         |sz3 AS (SELECT doc_id, COUNT(*) AS n_sh FROM shg
         |        GROUP BY doc_id),
         |int3 AS (
         |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter FROM ped c
         |  JOIN shg a ON a.doc_id = c.doc_a
         |  JOIN shg b ON b.doc_id = c.doc_b AND b.sh = a.sh
         |  GROUP BY c.doc_a, c.doc_b),
         |jp3 AS (
         |  SELECT i.doc_a, i.doc_b FROM int3 i
         |  JOIN sz3 sa ON sa.doc_id = i.doc_a
         |  JOIN sz3 sb ON sb.doc_id = i.doc_b
         |  WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter)
         |    >= $tau),
         |edg AS (SELECT doc_a AS src, doc_b AS dst FROM jp3
         |        UNION ALL SELECT doc_b, doc_a FROM jp3),
         |reach AS (
         |  SELECT src, dst FROM edg
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edg e ON r.dst = e.src),
         |st4 AS MATERIALIZED (
         |  SELECT s3.* FROM st3 s3
         |  LEFT JOIN (SELECT src, min(dst) AS mn FROM reach GROUP BY src) r
         |    ON r.src = s3.doc_id
         |  WHERE least(s3.doc_id, coalesce(r.mn, s3.doc_id)) = s3.doc_id),
         |besh AS MATERIALIZED (SELECT DISTINCT sh FROM shg WHERE doc_id % 50 = 0),
         |bb AS (
         |${bitsSel("besh", "sh")}),
         |bloomw AS (
         |  SELECT b // 32 AS word,
         |    bit_or(1::BIGINT << CAST(b % 32 AS INT)) AS bits
         |  FROM bb GROUP BY b // 32),
         |psh AS MATERIALIZED (SELECT sh4.doc_id, sh4.sh FROM shg sh4
         |        JOIN st4 ON st4.doc_id = sh4.doc_id),
         |pb AS (
         |${bitsSel("psh", "doc_id, sh")}),
         |pall AS (
         |  SELECT p.doc_id, p.sh,
         |    min(CASE WHEN (coalesce(w.bits, 0::BIGINT)
         |          & (1::BIGINT << CAST(p.b % 32 AS INT))) <> 0
         |        THEN 1 ELSE 0 END) AS all_set
         |  FROM pb p LEFT JOIN bloomw w ON w.word = p.b // 32
         |  GROUP BY p.doc_id, p.sh),
         |flagged AS (
         |  SELECT doc_id FROM pall WHERE all_set = 1
         |  GROUP BY doc_id HAVING count(*) >= 3),
         |st5 AS MATERIALIZED (SELECT * FROM st4
         |        WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
         |srcr AS (SELECT source, count(*) AS nds FROM st5 GROUP BY source),
         |stot AS (SELECT count(*) AS tot_docs,
         |         count(DISTINCT source) AS n_sources FROM st5),
         |rates AS (SELECT source,
         |          least(10000, tot_docs * 10000 // (n_sources * nds))
         |            AS rate_bp
         |          FROM srcr, stot),
         |st6 AS MATERIALIZED (
         |  SELECT s5.* FROM st5 s5 JOIN rates r USING (source)
         |  WHERE ('0x' || substr(md5('mix|' || s5.text), 1, 15))::BIGINT
         |    % 10000 < r.rate_bp),
         |pk AS (
         |  SELECT lang, doc_id, ntok,
         |    coalesce(sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS prefix
         |  FROM st6),
         |shards AS MATERIALIZED (
         |  SELECT lang, prefix // 512 AS shard,
         |    CAST(sum(ntok) AS BIGINT) AS stoks
         |  FROM pk GROUP BY 1, 2),
         |ch AS MATERIALIZED (
         |  SELECT doc_id, ntok,
         |    unnest(generate_series(0, ntok - 1, 96)) AS cs
         |  FROM st6)
         |${ledgerSelect}
         |ORDER BY stage_id""".stripMargin
    }
  )

  /** The 9-branch ledger readout: every count/sum CAST to BIGINT in
    * EVERY branch (DuckDB's sum(BIGINT) is HUGEINT, and UNION ALL
    * unifies to the widest type — one uncast branch flips the whole
    * column to decimal128 and kind-mismatches Spark's int64). */
  private def ledgerSelect: String = {
    def c(e: String) = s"(SELECT CAST($e AS BIGINT) FROM"
    def br(id: Int, name: String, din: String, dout: String,
        tin: String, tout: String) =
      s"""  SELECT CAST($id AS BIGINT) AS stage_id, '$name' AS stage,
         |    ${c("count(*)")} $din) AS docs_in,
         |    ${c("count(*)")} $dout) AS docs_out,
         |    ${c(s"coalesce(sum($tin), 0)")} $din) AS tokens_in,
         |    ${c(s"coalesce(sum($tout), 0)")} $dout) AS tokens_out""".stripMargin
    val rows = Seq(
      br(0, "ingest", "nrm", "nrm", "ntok_raw", "ntok_raw"),
      br(1, "normalize", "nrm", "st1", "ntok_raw", "ntok"),
      br(2, "nb_gate", "st1", "st2", "ntok", "ntok"),
      br(3, "exact_dedup", "st2", "st3", "ntok", "ntok"),
      br(4, "neardup_collapse", "st3", "st4", "ntok", "ntok"),
      br(5, "decontaminate", "st4", "st5", "ntok", "ntok"),
      br(6, "mixture", "st5", "st6", "ntok", "ntok"),
      br(7, "pack", "st6", "shards", "ntok", "stoks"),
      br(8, "chunk", "st6", "ch", "ntok", "least(128, ntok - cs)"))
    s"SELECT * FROM (\n${rows.mkString("\n  UNION ALL\n")}\n)"
  }
}
