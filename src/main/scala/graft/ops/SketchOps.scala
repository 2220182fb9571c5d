package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch: fixed-size approximate frequency table for heavy-hitter
  * estimation at 100 TB. Complements the existing sketch family (q51 HLL =
  * approx distinct, q52 KMV = distinct sample, Misra-Gries = top-k): CMS
  * answers point frequency queries ("how often does THIS key occur") with a
  * one-sided error bound — the estimate never undercounts, and overcounts by
  * at most ~2N/width with high probability (min over `Depth` independent
  * hash rows).
  *
  * The sketch is a (row, bucket) → count table of at most Depth×Width cells
  * regardless of input size: partial aggregation combines map-side, only
  * ≤2048 cells ever shuffle, merge across shards/streams is cell-wise SUM
  * (associative + commutative), and lookups broadcast the sketch. Hashing
  * uses the md5-derived [[TextOps.saltedHash60]] family (salt = row index)
  * so the DuckDB oracle re-derives identical cells — bit-exact, like q51/q52.
  */
object SketchOps {
  val CmsDepth = 4
  val CmsWidth = 512

  /** Bucket of `key` in hash row `i`: saltedHash60("i|key") mod Width.
    * hash60 is non-negative (60-bit), so `%` is a true mod. */
  def cmsBucket(key: Column, i: Int): Column =
    TextOps.saltedHash60(key.cast("string"), i) % CmsWidth

  /** The sketch table for one key column: (rw, bucket, cnt), ≤ Depth×Width
    * rows. One narrow generate (Depth cells per input row) feeding a
    * map-side-combined count — the shuffle carries cells, not rows. */
  def cmsSketch(df: DataFrame, keyCol: String): DataFrame =
    df.select(explode(array((0 until CmsDepth).map(i =>
        struct(lit(i).as("rw"), cmsBucket(col(keyCol), i).as("bucket"))): _*))
        .as("c"))
      .select(col("c.rw").as("rw"), col("c.bucket").as("bucket"))
      .groupBy(col("rw"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** AMS/CMS inner-product estimate of an equi-join's output cardinality
    * (Alon-Matias-Szegedy via Count-Min, Cormode & Muthukrishnan 2005):
    * |A ⋈ B on k| = Σ_k a_k·b_k, and for each hash row i,
    * Σ_bucket cntA[i][b]·cntB[i][b] ≥ Σ_k a_k·b_k (colliding keys only ADD
    * cross terms) — so every row's estimate is an OVER-estimate and the
    * min over rows is the tightest. This is the planner primitive that
    * decides join strategy at 100 TB WITHOUT running the join: both
    * sketches are ≤Depth×Width cells built by map-side-combined scans, the
    * estimate joins 2048-row tables — no fact-table shuffle anywhere.
    * At petabyte counts the cell product can exceed Long; widen `cnt` to
    * DECIMAL(38,0) before multiplying there (exactness preserved).
    * Output: one row per hash row (rw, est_rows). */
  def cmsInnerProduct(sa: DataFrame, sb: DataFrame): DataFrame =
    sa.select(col("rw"), col("bucket"), col("cnt").as("cnt_a"))
      .join(sb.select(col("rw"), col("bucket"), col("cnt").as("cnt_b")),
        Seq("rw", "bucket"))
      .groupBy(col("rw"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("est_rows"))

  /** Point-frequency estimates for the keys in `keys` (every column of
    * `keys` is carried through): min over the Depth rows of the addressed
    * cells. The sketch side is ≤2048 rows → broadcast; the keys side never
    * shuffles beyond its own final ordering. */
  def cmsLookup(sketch: DataFrame, keys: DataFrame, keyCol: String): DataFrame = {
    val carried = keys.columns.toSeq
    val addressed = keys.select(
      col("*"),
      explode(array((0 until CmsDepth).map(i =>
        struct(lit(i).as("rw"), cmsBucket(col(keyCol), i).as("bucket"))): _*))
        .as("c"))
      .select((carried.map(col) :+ col("c.rw").as("rw") :+
        col("c.bucket").as("bucket")): _*)
    addressed.join(broadcast(sketch), Seq("rw", "bucket"))
      .groupBy(carried.map(col).toIndexedSeq: _*)
      .agg(min(col("cnt")).as("cms_est"))
  }
}
