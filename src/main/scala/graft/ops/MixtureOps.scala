package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Epoch-capped water-filling token allocation — the mixture-planning
  * primitive shared by q93 (hand-set lang targets) and p10 (measured
  * DoReMi source weights): distribute a token budget across domains in
  * proportion to `target_ppm`, but no domain may exceed `cap_tokens`
  * (its epoch cap); freed budget from capped domains re-fills the
  * still-active ones in later rounds.
  *
  * All arithmetic is integer-exact (DIV + explicit remainder term, no
  * doubles), so the oracle reproduces the identical sequence. The loop
  * is unrolled on the driver over a |domains|-row frame — each round is
  * one scalar agg broadcast back in, localCheckpointed to keep the plan
  * flat; the corpus-scale work (token counting / weight measurement)
  * happens BEFORE the frame reaches this function, so at 100 TB the
  * allocator costs |domains| rows × rounds regardless of corpus size. */
object MixtureOps {

  /** Runs `rounds` redistribution rounds over a domain frame that must
    * carry `target_ppm`, `budget` (same value every row), and
    * `cap_tokens`. Returns the frame with `capped_round` (0 = never
    * capped, else the round it capped in) and final `alloc_tokens`. */
  def waterFill(st0: DataFrame, rounds: Int): DataFrame = {
    var st = st0
      .withColumn("capped_round", lit(0L))
      .withColumn("alloc_tokens", lit(0L))
    for (r <- 1 to rounds) {
      val sc = st.agg(
        coalesce(sum(when(col("capped_round") === 0, col("target_ppm"))),
          lit(0L)).as("w_act"),
        coalesce(sum(when(col("capped_round") =!= 0, col("alloc_tokens"))),
          lit(0L)).as("capped_alloc"))
      st = st.crossJoin(broadcast(sc))
        .withColumn("want", expr(
          """CASE WHEN w_act = 0 THEN 0L
            |ELSE ((budget - capped_alloc) DIV w_act) * target_ppm
            |  + (((budget - capped_alloc) % w_act) * target_ppm)
            |    DIV w_act END""".stripMargin))
        .withColumn("now_capped",
          col("capped_round") === 0 && col("want") > col("cap_tokens"))
        .withColumn("alloc_tokens",
          when(col("capped_round") =!= 0, col("alloc_tokens"))
            .when(col("now_capped"), col("cap_tokens"))
            .otherwise(col("want")))
        .withColumn("capped_round",
          when(col("now_capped"), lit(r.toLong))
            .otherwise(col("capped_round")))
        .drop("w_act", "capped_alloc", "want", "now_capped")
        .transform(graft.Tables.stage) // |domains| rows; keeps the unrolled plan flat
    }
    st
  }
}
