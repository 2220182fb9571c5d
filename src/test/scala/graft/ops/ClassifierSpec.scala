package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  private def tfOf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))

  test("nb predicts the class whose token distribution matches") {
    // class 1 speaks x/y, class 0 speaks z/w — disjoint vocabularies, so
    // the smoothed likelihoods dominate any prior imbalance
    val train = Seq((1L, "x x y x"), (3L, "x y y"), (5L, "y x x"),
      (2L, "z z w"), (4L, "w z w w"))
    val lab = Seq((1L, 1), (3L, 1), (5L, 1), (2L, 0), (4L, 0)).toDF("doc_id", "cls")
    val test_ = Seq((10L, "x y x"), (12L, "z w w"))
    val out = ClassifierOps.nbPredict(tfOf(train), lab, tfOf(test_),
      Seq(10L, 12L).toDF("doc_id"))
      .select("doc_id", "pred_cls").as[(Long, Int)].collect().toMap
    assert(out == Map(10L -> 1, 12L -> 0))
  }

  test("featureless docs fall back to the prior; margin is the prior gap") {
    // doc 20 has no rows in testTf → scored on priors alone; with 3
    // class-1 and 1 class-0 train docs the smoothed prior favors class 1
    val train = Seq((1L, "x"), (3L, "x"), (5L, "x"), (2L, "z"))
    val lab = Seq((1L, 1), (3L, 1), (5L, 1), (2L, 0)).toDF("doc_id", "cls")
    val out = ClassifierOps.nbPredict(tfOf(train), lab,
      tfOf(Seq.empty[(Long, String)]), Seq(20L).toDF("doc_id"))
      .select("doc_id", "pred_cls", "margin_ppm")
      .as[(Long, Int, Long)].collect()
    assert(out.length == 1 && out.head._2 == 1,
      s"prior-only doc must take the majority class: ${out.toSeq}")
    // margin = ln((3+1)/6) − ln((1+1)/6) ≈ ln 2 ≈ 0.693 · 10⁶ ppm
    assert(math.abs(out.head._3 - 693147L) < 5000,
      s"prior-only margin must be ~ln2 in ppm: ${out.head._3}")
  }

  test("k-class argmax routes each dialect to its class; ties break low") {
    // three disjoint dialects; test doc 14 mixes classes 0 and 2 equally
    // (same tf, same per-class counts by symmetry) → scores tie → the
    // (score DESC, cls ASC) window must pick class 0
    val train = Seq((1L, "x x"), (2L, "y y"), (3L, "z z"))
    val lab = Seq((1L, 0), (2L, 1), (3L, 2)).toDF("doc_id", "cls")
    val out = ClassifierOps.nbPredictK(tfOf(train), lab,
      tfOf(Seq((10L, "x"), (12L, "y"), (13L, "z"), (14L, "x z"))),
      Seq(10L, 12L, 13L, 14L).toDF("doc_id"), k = 3)
      .select("doc_id", "pred_cls").as[(Long, Int)].collect().toMap
    assert(out == Map(10L -> 0, 12L -> 1, 13L -> 2, 14L -> 0))
  }

  test("a class absent from training stays finite and loses") {
    // all training docs are class 0; smoothing keeps class 1 scoreable
    // (no nulls, no division blowup) but it must not win on a vocab doc
    val train = Seq((2L, "z w z"), (4L, "w w z"))
    val lab = Seq((2L, 0), (4L, 0)).toDF("doc_id", "cls")
    val out = ClassifierOps.nbPredict(tfOf(train), lab, tfOf(Seq((10L, "z w"))),
      Seq(10L).toDF("doc_id"))
      .select("doc_id", "pred_cls", "margin_ppm")
      .as[(Long, Int, Long)].collect().head
    assert(out._2 == 0 && out._3 < 0,
      s"empty class must lose on in-vocabulary docs: $out")
  }
}
