package graft.ops

import graft.SparkSpecBase
import graft.ops.TextOps._
import org.apache.spark.sql.functions._

/** The persisted NB model must be a pure lifecycle split — never a
  * semantic fork: a model derived from the ClassifierIndex artifact has
  * to score bit-identically to one trained in-query on the same docs
  * (the stats are exact BIGINT aggregations; parquet roundtrips them
  * exactly), and the corpus fingerprint must make stale serving
  * impossible. */
class ClassifierIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus() = {
    val t = graft.Tables.fanout(graft.Tables.documents(spark, sfDir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val lab = t.select(col("doc_id"),
      when(wordSetCount(col("toks"), stopwords) * 10000
        >= lit(graft.queries.TextQueries.QualityKeepBp) * size(col("toks")), 1)
        .otherwise(0).as("cls"))
    val tf = t.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    (lab, tf)
  }

  test("persisted binary model scores bit-equal to in-query training") {
    val (lab, tf) = corpus()
    val inQuery = ClassifierOps.nbPredict(
        tf.filter(col("doc_id") % 4 =!= 0), lab.filter(col("doc_id") % 4 =!= 0),
        tf.filter(col("doc_id") % 4 === 0),
        lab.filter(col("doc_id") % 4 === 0).select("doc_id"))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(inQuery.nonEmpty)

    val p = ClassifierIndex.ensure(spark, sfDir, ClassifierIndex.Binary)
    val (seen, consts) = ClassifierIndex.trainModel(spark, p, 2)
    val served = ClassifierOps.nbScore(seen, consts,
        tf.filter(col("doc_id") % 4 === 0),
        lab.filter(col("doc_id") % 4 === 0).select("doc_id"))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(served.sameElements(inQuery),
      "persisted-model margins diverged from in-query training")
  }

  test("persisted tercile model scores bit-equal to in-query training") {
    val t = graft.Tables.fanout(graft.Tables.documents(spark, sfDir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val stop = wordSetCount(col("toks"), stopwords) * 10000
    val lab = t.select(col("doc_id"),
      when(stop < lit(graft.queries.TextQueries.TercileLoBp)
          * size(col("toks")), 0)
        .when(stop < lit(graft.queries.TextQueries.TercileHiBp)
          * size(col("toks")), 1)
        .otherwise(2).as("cls"))
    val tf = t.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val inQuery = ClassifierOps.nbPredictK(
        tf.filter(col("doc_id") % 4 =!= 0), lab.filter(col("doc_id") % 4 =!= 0),
        tf.filter(col("doc_id") % 4 === 0),
        lab.filter(col("doc_id") % 4 === 0).select("doc_id"), k = 3)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val p = ClassifierIndex.ensure(spark, sfDir, ClassifierIndex.Tercile)
    val (seen, consts) = ClassifierIndex.trainModel(spark, p, 3)
    val served = ClassifierOps.nbScoreK(seen, consts,
        tf.filter(col("doc_id") % 4 === 0),
        lab.filter(col("doc_id") % 4 === 0).select("doc_id"), k = 3)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(inQuery.nonEmpty && served.sameElements(inQuery))
  }

  test("teacher frame matches the recomputed heuristic labels") {
    val (lab, _) = corpus()
    val p = ClassifierIndex.ensure(spark, sfDir, ClassifierIndex.Binary)
    val persisted = ClassifierIndex.teacher(spark, p)
      .select(col("doc_id"), col("cls"), col("fold"))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val expect = lab.select(col("doc_id"), col("cls"),
        (col("doc_id") % 4).as("fold"))
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(persisted.sameElements(expect))
  }

  test("corpus fingerprint keys the artifact; ensure is build-once") {
    val r1 = ClassifierIndex.indexRoot(spark, sfDir, ClassifierIndex.Binary)
    val r2 = ClassifierIndex.indexRoot(spark, "/root/testdata/sf0.01",
      ClassifierIndex.Binary)
    assert(r1 != r2, "different corpora must key different artifacts")
    assert(r1 != ClassifierIndex.indexRoot(spark, sfDir,
      ClassifierIndex.Tercile), "kinds must key different artifacts")
    // second ensure must be a no-op read, not a rebuild
    val p = ClassifierIndex.ensure(spark, sfDir, ClassifierIndex.Binary)
    val fs = new org.apache.hadoop.fs.Path(p.root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val m0 = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(p.tokcnt, "_SUCCESS")).getModificationTime
    ClassifierIndex.ensure(spark, sfDir, ClassifierIndex.Binary)
    val m1 = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(p.tokcnt, "_SUCCESS")).getModificationTime
    assert(m0 == m1, "ensure rebuilt an already-complete artifact")
  }
}
