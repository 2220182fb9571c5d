package graft

import org.apache.spark.sql.functions._

/** The persisted inverted index's lifecycle contract (t36 ↔ t50 is
  * n14 ↔ n15 for lexical retrieval): serving from the index is
  * bit-identical to the end-to-end recompute, the build runs once per
  * corpus, and the denormalized posting rows conserve exact token mass.
  */
class Bm25IndexSpec extends SparkSpecBase {
  import graft.ops.Bm25Index

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("index-served BM25 is bit-identical to the end-to-end form") {
    val served = rows(SparkEntry.queries("t50_bm25_serve")(spark, sfDir))
    val e2e = rows(SparkEntry.queries("t36_bm25")(spark, sfDir))
    assert(served == e2e)
    assert(served.nonEmpty)
  }

  test("ensure() builds once: a second call reuses the persisted index") {
    val p = Bm25Index.ensure(spark, sfDir)
    val fs = new org.apache.hadoop.fs.Path(p.root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def mtime: Long = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(p.postings, "_SUCCESS"))
      .getModificationTime
    val t0 = mtime
    val p2 = Bm25Index.ensure(spark, sfDir)
    assert(p2.root == p.root)
    assert(mtime == t0, "second ensure() must not rewrite the postings")
  }

  test("posting rows conserve token mass: per-doc Σtf equals the stored dl") {
    // dl is denormalized into every posting row (the join-free serving
    // trick) — it must agree with the tf mass it rides next to, and be
    // constant within a doc.
    val p = Bm25Index.ensure(spark, sfDir)
    val post = spark.read.parquet(p.postings)
    val bad = post.groupBy(col("did"))
      .agg(sum(col("tf")).as("mass"), min(col("dl")).as("dmin"),
        max(col("dl")).as("dmax"))
      .filter(col("mass") =!= col("dmin") || col("dmin") =!= col("dmax"))
      .count()
    assert(bad == 0L)
    // and the stats row is exactly the postings' global mass
    val stats = spark.read.parquet(p.stats).collect()(0)
    val mass = post.agg(sum(col("tf"))).collect()(0).getLong(0)
    assert(stats.getAs[Long]("n_toks") == mass)
  }
}
