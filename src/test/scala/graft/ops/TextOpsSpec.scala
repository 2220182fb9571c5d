package graft.ops

import graft.SparkSpecBase
import graft.ops.TextOps._
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenizer collapses runs of whitespace and trims") {
    val df = Seq("  the   quick\tfox  ").toDF("text")
    val toks = df.select(tokens(col("text"))).as[Seq[String]].collect()(0)
    assert(toks == Seq("the", "quick", "fox"))
  }

  test("stopword count and punct count") {
    val df = Seq("the cat, the dog: and a bird!").toDF("text")
    val row = df.select(
      wordSetCount(tokens(col("text")), stopwords),
      punctCount(col("text"))).as[(Long, Long)].collect()(0)
    // "the","the","and","a" are stopwords; bird! retains '!' -> , : ! = 3
    assert(row == ((4L, 3L)))
  }

  test("rolling fingerprint is order-sensitive; md5 fingerprint is not position-aware") {
    val df = Seq(("a b c", 1), ("c b a", 2)).toDF("text", "id")
    val fps = df.select(rollingFingerprint(tokens(col("text")))).as[Long].collect()
    assert(fps(0) != fps(1), "reordered tokens must change the rolling hash")
    assert(fps.forall(f => f >= 0 && f < 1000000007L))
  }

  test("hash60 matches the Scala-side md5 computation (cross-engine family)") {
    val got = Seq("abc").toDF("x").select(hash60(col("x"))).as[Long].collect()(0)
    // first 15 hex chars of md5("abc") = 900150983cd24fb -> 648541476951500027
    assert(got == 648541476951500027L)
  }

  test("language predict precedence is deterministic on ties") {
    val df = Seq((0L, 0L, 0L)).toDF("e", "d", "s")
    val p = df.select(langPredict(col("e"), col("d"), col("s"))).as[String].collect()(0)
    assert(p == "en")
  }
}
