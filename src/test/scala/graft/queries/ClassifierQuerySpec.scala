package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Cross-query identities of the distilled-classifier family. */
class ClassifierQuerySpec extends SparkSpecBase {
  import spark.implicits._

  test("cross-validation fold 0 reproduces t38's holdout accuracy exactly") {
    // t38 trains on %4≠0 and scores %4=0; t38e's fold-0 model is derived
    // by COUNT SUBTRACTION from one global pass — identical arithmetic
    // must land on the identical accuracy (the subtraction formulation
    // is an algebraic identity, not an approximation).
    val t38 = TextQueries.queries("t38_quality_distill")(spark, sfDir)
      .select(col("accuracy_ppm")).as[Long].head()
    val fold0 = TextQueries.queries("t38e_crossval")(spark, sfDir)
      .filter(col("fold") === 0).select(col("acc_ppm")).as[Long].head()
    assert(fold0 == t38,
      s"fold-0 CV accuracy $fold0 != t38 holdout accuracy $t38")
  }

  test("t41 refresh: base+delta count addition ≡ the full-train model") {
    // The post-delta model is derived by ADDING fold 3's counts to the
    // folds-{1,2} stats — if that addition is really equivalent to a
    // from-scratch retrain on folds {1,2,3}, its holdout accuracy must
    // equal t38's (which trains in-query on %4≠0) to the ppm.
    val t38 = TextQueries.queries("t38_quality_distill")(spark, sfDir)
      .select(col("accuracy_ppm")).as[Long].head()
    val r = TextQueries.queries("t41_model_refresh")(spark, sfDir)
      .select(col("acc_upd_ppm"), col("n_flips"), col("n_flip_to_keep"),
        col("n_flip_to_drop"))
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 == t38, s"refreshed-model accuracy ${r._1} != t38 $t38")
    assert(r._2 == r._3 + r._4, "flip directions must partition the flips")
  }

  test("t38d's widened ρ numerator survives >16.6k-doc holdouts") {
    // worst case Σd² = n(n²−1)/3 gives numerator 2·10⁶·n³: at n = 20 000
    // that is 1.6e19 > 2⁶³ — plain BIGINT would wrap; the DECIMAL(38,0)
    // form must land exactly on ρ = 10⁶ − 2·10⁶ = −10⁶. Plus two small-n
    // cases checkable by hand (perfect agreement and one swap).
    val rows = Seq(
      (20000L, 20000L * (20000L * 20000L - 1L) / 3L, -1000000L),
      (100L, 0L, 1000000L),              // identical rankings
      (4L, 2L, 1000000L - 200000L))      // one adjacent swap: 6·2·10⁶/60
    val got = rows.map { case (n, d2, _) => (n, d2) }
      .toDF("n", "sum_d2")
      .select(col("n"), TextQueries.rhoPpmExpr.as("rho"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (n, _, want) =>
      assert(got(n) == want, s"n=$n: rho ${got(n)} != $want")
    }
  }
}
