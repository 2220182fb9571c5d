package graft.functions

import graft.{SparkSpecBase, Tables}
import graft.ops.TextOps
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val tokens: Seq[String] = Tables.documents(spark, sfDir)
    .select(explode(TextOps.tokens(col("text"))).as("tok"))
    .as[String].collect().toSeq

  test("exact when the vocabulary fits the capacity (err = 0)") {
    val xs = Seq("a", "b", "a", "c", "a", "b")
    val agg = new FrequentItemsAggregator(capacity = 10, topK = 10)
    val got = xs.toDS().select(agg.toColumn).head()
    assert(got.map(f => (f.item, f.countLow)).toSeq ==
      Seq(("a", 3L), ("b", 2L), ("c", 1L)))
    assert(got.forall(f => f.countHigh == f.countLow), "no prune → no error")
  }

  test("heavy hitters survive under tight capacity with bounded error") {
    val n = tokens.length
    val capacity = 20
    val truth = tokens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val agg = new FrequentItemsAggregator(capacity, topK = capacity)
    val got = tokens.toDS().repartition(8).select(agg.toColumn).head()
    val reported = got.map(f => f.item -> f).toMap

    // no false negatives: every true heavy hitter (> n/(capacity+1)) is in
    val threshold = n.toLong / (capacity + 1)
    truth.filter(_._2 > threshold).keys.foreach { hh =>
      assert(reported.contains(hh), s"heavy hitter '$hh' (${truth(hh)}) missing")
    }
    // bounds: low <= true <= high for everything reported
    reported.foreach { case (item, f) =>
      val t = truth(item)
      assert(f.countLow <= t && t <= f.countHigh,
        s"'$item': bounds [${f.countLow}, ${f.countHigh}] must contain $t")
    }
  }

  test("guarantees hold regardless of partitioning (merge order)") {
    val truth = tokens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = tokens.length
    val capacity = 20
    Seq(2, 32).foreach { parts =>
      val agg = new FrequentItemsAggregator(capacity, topK = capacity)
      val got = tokens.toDS().repartition(parts).select(agg.toColumn).head()
      val reported = got.map(f => f.item -> f).toMap
      truth.filter(_._2 > n.toLong / (capacity + 1)).keys.foreach { hh =>
        assert(reported.contains(hh), s"parts=$parts: missing '$hh'")
      }
      reported.foreach { case (item, f) =>
        val t = truth(item)
        assert(f.countLow <= t && t <= f.countHigh, s"parts=$parts '$item'")
      }
    }
  }
}
