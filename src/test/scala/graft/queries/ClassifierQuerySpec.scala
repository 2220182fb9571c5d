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
}
