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
}
