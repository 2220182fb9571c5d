package graft.streaming

import graft.ops.ClassifierOps.lnPpmExpr
import graft.ops.TextOps.{hash32, saltedHash60}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR data selection (Xie et al., NeurIPS 2023) at INGEST: the
  * hashed-bigram importance model t44 trains offline — 256 longs,
  * ln p̂_target(bucket) − ln p̂_raw(bucket) in ppm — embedded as ONE
  * literal map column (the StreamingNbGate / StreamingIvfAdmission
  * discipline: no stream-static join re-shipping the model per batch,
  * no state store, no shuffle). Each arriving doc folds its bigrams
  * through the map, adds the hash-decided Gumbel perturbation (the
  * Gumbel-top-k trick's noise, drawn from a 32-bit md5 of the doc id so
  * batch and stream compute the SAME integer), and is admitted iff
  * `w + g ≥ τ` — τ being the batch planner's budget boundary (the
  * key of the budget-th selected doc), inherited as a plan literal the
  * way StreamingRangeRouter inherits q91's boundaries.
  *
  * The honest streaming contract is THRESHOLD admission, not top-k: a
  * stream cannot rank against documents it has not seen. The spec
  * proves admitted ≡ batch `key_ppm ≥ τ` on replay (bit-equal keys),
  * which equals batch top-k exactly when no key ties the boundary —
  * keys are 64-bit sums of two hash-decided ppm terms, so boundary
  * ties are the 1/2⁶⁰ collision class the hash60 family already
  * accepts. Cost per doc: |bigrams| map probes + two integer-ln folds —
  * independent of corpus size.
  */
object StreamingDsirGate {

  /** Adds `w_ppm, g_ppm, key_ppm, admitted` to a frame bearing
    * `doc_id` (long) and `toks` (array&lt;string&gt;). Docs with fewer
    * than 2 tokens have no features: they carry w=0 and are the
    * caller's policy call (batch t44's pool excludes them). */
  def withKey(df: DataFrame, rPpm: Map[Long, Long], salt: Int,
      buckets: Int, tauPpm: Long, maxBuckets: Int = 65536): DataFrame = {
    require(rPpm.size <= maxBuckets,
      s"bucket model ${rPpm.size} exceeds $maxBuckets — serve via a " +
        "broadcast stream-static join, not a plan literal")
    val wLit = typedLit(rPpm)
    df.withColumn("w_ppm", aggregate(
        transform(
          when(size(col("toks")) >= 2, expr(
            "zip_with(slice(toks, 1, size(toks)-1), " +
              "slice(toks, 2, size(toks)-1), (a, x) -> concat(a, ' ', x))"))
            .otherwise(array().cast("array<string>")),
          g => coalesce(
            element_at(wLit, pmod(saltedHash60(g, salt), lit(buckets.toLong))),
            lit(0L))),
        lit(0L), (acc, w) => acc + w))
      .withColumn("h", greatest(
        hash32(concat(lit("g|"), col("doc_id").cast("string"))), lit(1L)))
      .withColumn("appm",
        expr(s"greatest(1386294L - (${lnPpmExpr("h")}), 1L)"))
      .withColumn("g_ppm", expr(s"-(${lnPpmExpr("appm")}) - 6978904L"))
      .withColumn("key_ppm", col("w_ppm") + col("g_ppm"))
      .withColumn("admitted", col("key_ppm") >= tauPpm)
      .drop("h", "appm")
  }
}
