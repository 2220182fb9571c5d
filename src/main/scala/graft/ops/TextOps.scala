package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All operators are built-in Catalyst expressions (split / transform /
  * aggregate / md5 / conv) — fully whole-stage-codegen'd, no UDFs, so a
  * 100 TB `documents` scan stays a single narrow stage with zero shuffle.
  * Every function has an exact DuckDB-SQL mirror (see
  * [[graft.queries.TextQueries]]) so results are oracle-verifiable
  * cross-engine: hashing goes through md5 (identical bytes-in/hex-out in
  * both engines) rather than engine-private hash functions.
  *
  * Determinism: all per-row math (folds over token lists) runs in a fixed
  * left-to-right order — results are bit-identical regardless of
  * partitioning, unlike cross-row double aggregation.
  */
object TextOps {

  /** Whitespace tokenizer: `split(trim(text), "\s+")`. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** Punctuation count over an explicit char class (portable regex —
    * `\p{Punct}` and POSIX `[[:punct:]]` differ across engines). */
  def punctCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[.,!?;:]", ""))).cast("long")

  /** 60-bit hash shared across engines: first 15 hex chars of md5 as BIGINT.
    * DuckDB mirror: `('0x' || substr(md5(x), 1, 15))::BIGINT`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Salted member of the md5 hash family (salt selects the function) —
    * used by MinHash signatures. */
  def saltedHash60(c: Column, salt: Int): Column =
    hash60(concat(lit(s"$salt|"), c))

  /** 32-bit base hash (first 8 hex chars of md5): the ONE expensive hash per
    * token that the cheap linear MinHash permutations are applied to.
    * DuckDB mirror: `('0x' || substr(md5(x), 1, 8))::BIGINT`. */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Universal-hash-family parameters for permutation `i`, derived
    * deterministically from md5 so both engines can re-derive them:
    * a ∈ [1, 2^30), b ∈ [0, P). With base < 2^32, a*base + b < 2^63 —
    * no overflow in either engine's BIGINT. */
  val MinhashP = 1000000007L
  def permParams(i: Int): (Long, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"perm$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val a = (java.lang.Long.parseLong(hex.substring(0, 8), 16) % ((1L << 30) - 1)) + 1
    val b = java.lang.Long.parseLong(hex.substring(8, 16), 16) % MinhashP
    (a, b)
  }

  /** Driver/processor-side twin of [[hash60]]: first 15 hex chars of md5
    * as a Long — bit-identical to the Column form (and the DuckDB
    * mirror), so streaming processors can re-derive plan-side hashes. */
  def hash60Scala(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Count of tokens that appear in `words`. */
  def wordSetCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  /** Sum of token lengths (exact integer — safe to ratio later). */
  def totalTokenLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _)

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** 60-bit whole-document fingerprint. */
  def fingerprint64(c: Column): Column = hash60(c)

  /** Rolling (Rabin-Karp-style) fingerprint over the token stream:
    * fold-left `acc = (acc*31 + h(tok)) % P`, P = 1e9+7. Order-sensitive —
    * same bag of words in a different order fingerprints differently,
    * unlike the whole-document md5. */
  def rollingFingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t => hash60(t) % 1000000007L),
      lit(0L),
      (acc, h) => (acc * 31 + h) % 1000000007L)

  /** Occurrence count of the most frequent token (repetition signal): max
    * over distinct tokens of that token's frequency. O(|distinct|·|toks|)
    * per row — pure per-row HOFs, no explode, no shuffle. */
  def topTokenCount(toks: Column): Column =
    coalesce(
      array_max(transform(array_distinct(toks),
        t => size(filter(toks, x => x === t)).cast("long"))),
      lit(0L))

  /** Language-ID marker sets (tiny n-gram/function-word heuristic). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "los", "es"))

  /** Deterministic 3-way argmax with fixed precedence en > de > es. */
  def langPredict(sEn: Column, sDe: Column, sEs: Column): Column =
    when(sEn >= sDe && sEn >= sEs, "en")
      .when(sDe >= sEs, "de")
      .otherwise("es")
}
