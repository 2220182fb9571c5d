package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the native codegen'd [[VectorExpressions.BandedDtw8]] kernel
  * BIT-for-bit against the reference higher-order-aggregate fold
  * (`RelationalQueries.sparkDtwExpr` — the formulation the DuckDB oracle
  * mirrors symbol-for-symbol). q79c's oracle row stays meaningful only
  * while this equality holds: the hot path runs the native kernel, the
  * gate replays the fold. */
class DtwKernelSpec extends SparkSpecBase {
  import spark.implicits._

  private def zn(src: String) = expr(
    s"transform(arr_$src, x -> CASE WHEN std_$src = 0.0D THEN 0.0D " +
      s"ELSE (x - mean_$src) / std_$src END)")

  test("BandedDtw8 ≡ fold DP bit-for-bit on the real q79c candidate set") {
    val rows = graft.queries.RelationalQueries.saxCandidatePairs(spark, sfDir)
      .withColumn("za", zn("a")).withColumn("zb", zn("b"))
      .withColumn("nat", VectorExpressions.banded_dtw8(col("za"), col("zb")))
      .withColumn("fld", expr(graft.queries.RelationalQueries.sparkDtwExpr))
      .select(col("nat"), col("fld")).as[(Double, Double)].collect()
    assert(rows.nonEmpty, "no SAX candidates — the equality test saw nothing")
    rows.foreach { case (n, f) =>
      assert(java.lang.Double.doubleToRawLongBits(n) ==
        java.lang.Double.doubleToRawLongBits(f), s"native $n != fold $f")
    }
  }

  test("BandedDtw8 ≡ fold DP on adversarial random windows") {
    val rnd = new scala.util.Random(1913)
    // mix of smooth, spiky, constant, and phase-shifted series — incl.
    // the one-step-shift case the band exists for
    val base = (1 to 400).map { _ =>
      Seq.fill(8)(math.rint(rnd.nextGaussian() * 1000) / 1000)
    }
    val pairs = base.zip(base.drop(1) :+ base.head).map { case (a, b) =>
      (a, if (rnd.nextBoolean()) b else a.drop(1) :+ a.head)
    }
    val df = pairs.toDF("za", "zb")
      .withColumn("nat", VectorExpressions.banded_dtw8(col("za"), col("zb")))
      .withColumn("fld", expr(graft.queries.RelationalQueries.sparkDtwExpr))
    val bad = df.filter(col("nat") =!= col("fld")).count()
    assert(bad == 0)
    // the shifted twin must score FAR below the diagonal L2 (the band's
    // whole point) on at least some pairs — guards a degenerate kernel
    // that just computes straight L2
    val l2 = expr("aggregate(zip_with(za, zb, (x, y) -> (x-y)*(x-y)), " +
      "0.0D, (a, z) -> a + z)")
    assert(df.filter(col("nat") < l2 * 0.5).count() > 0)
  }

  test("BandedDtw8 is null on malformed (≠8-element) input") {
    val df = Seq((Seq(1.0, 2.0), Seq.fill(8)(0.0))).toDF("za", "zb")
      .select(VectorExpressions.banded_dtw8(col("za"), col("zb")).as("d"))
    assert(df.filter(col("d").isNull).count() == 1)
  }
}
