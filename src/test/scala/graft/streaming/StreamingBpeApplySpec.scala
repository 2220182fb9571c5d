package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streamed BPE tokenizer (t46's merges served as literal folds)
  * must equal an independent greedy-leftmost reference implementation
  * on every corpus word, and its total symbol output must reconcile
  * with the trainer's own final rewrite. */
class StreamingBpeApplySpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed BPE apply ≡ greedy reference ≡ the trained rewrite") {
    implicit val ctx = spark.sqlContext
    val t46 = graft.queries.TextQueries.queries("t46_bpe_train")(
      spark, sfDir).collect().sortBy(_.getAs[Long]("round"))
    val merges = t46.map(r => (r.getAs[String]("left_sym"),
      r.getAs[String]("right_sym"))).toSeq
    assert(merges.length == 4 && merges.distinct.length == 4)
    val symbolsAfter = t46.last.getAs[Long]("symbols_after")

    // independent reference: plain Scala greedy-leftmost fold per merge
    def ref(w: String): Seq[String] =
      merges.foldLeft(w.map(_.toString): Seq[String]) {
        case (syms, (l, r)) =>
          syms.foldLeft(Vector.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == l && s == r)
              acc.init :+ (l + r)
            else acc :+ s
          }
      }

    val words = graft.Tables.documents(spark, sfDir)
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "").distinct()
      .as[String].collect().sorted
    assert(words.nonEmpty)

    val in = MemoryStream[String]
    val out = in.toDF().toDF("word")
      .select(col("word"),
        StreamingBpeApply.tokenize("word", merges).as("syms"))
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("bpe_apply").start()
    try {
      val (b1, b2) = words.splitAt(words.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.table("bpe_apply")
        .as[(String, Seq[String])].collect().toMap
      assert(got.size == words.length)
      words.foreach { w =>
        assert(got(w) == ref(w),
          s"'$w': stream ${got(w)} != reference ${ref(w)}")
      }
      // serving reproduces the trainer's own final rewrite: summed
      // symbol counts over the distinct vocab = round-4 symbols_after
      assert(got.values.map(_.length.toLong).sum == symbolsAfter,
        "streamed apply must reconcile with the trainer's rewrite")
    } finally q.stop()
  }

  test("empty word tokenizes to an empty array, not [\"\", \"\"]") {
    // sequence(1, 0) is DESCENDING [1, 0]; unguarded it would emit two
    // empty-string symbols for a zero-length word. The guard matches
    // the trainer's `word <> ''` filter.
    val merges = Seq(("a", "b"))
    val out = Seq("", "ab", "x").toDF("word")
      .select(col("word"),
        StreamingBpeApply.tokenize("word", merges).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("") == Seq.empty[String])
    assert(out("ab") == Seq("ab") && out("x") == Seq("x"))
  }
}
