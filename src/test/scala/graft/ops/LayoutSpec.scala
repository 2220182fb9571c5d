package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Z-order layout ([[LayoutOps]]): the Morton key must be an exact
  * invertible interleave, and clustering by it must give every partition a
  * tight bounding box in BOTH dimensions — the property file-level min/max
  * skipping depends on. */
class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private def unZ(z: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    (0 until 16).foreach { i =>
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (x, y)
  }

  test("morton key round-trips through the scala inverse") {
    val pts = for (x <- 0L until 64L by 7L; y <- 0L until 64L by 11L)
      yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), LayoutOps.zorder16(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(unZ(z) == ((x, y)), s"z=$z must decode to ($x,$y)") }
    // distinct inputs → distinct keys (it's a bijection on 16-bit pairs)
    assert(got.map(_._3).distinct.length == pts.length)
  }

  test("compaction collapses a small-file directory, content-preserving") {
    val dir = java.nio.file.Files.createTempDirectory("compact-in").toString
    val out = java.nio.file.Files.createTempDirectory("compact-out").toString + "/c"
    // many single-row files — the streaming-sink pathology (AQE may
    // coalesce some of the round-robin partitions; fragmentation is what
    // matters, not the exact count)
    spark.range(40).repartition(40).write.mode("overwrite").parquet(dir)
    val stats = LayoutOps.compactParquet(spark, dir, out, targetBytes = 1L << 20)
    assert(stats.filesBefore >= 10, s"fixture must fragment: $stats")
    assert(stats.filesOut == 1, s"tiny input compacts to one file: $stats")
    val got = spark.read.parquet(out).as[Long].collect().sorted.toSeq
    assert(got == (0L until 40L).toSeq, "compaction must not lose rows")
  }

  test("z-clustered partitions have tight two-dimensional bounding boxes") {
    // 256×256 grid, 16 range partitions on the z-key: each partition's
    // bbox should cover ~1/16 of the area; a single-dimension sort would
    // give full-width stripes in the trailing dimension instead
    val grid = (for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y))
      .toDF("x", "y")
    val parts = LayoutOps.zorderCluster(grid, col("x"), col("y"), 16)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1))
        .as("bbox_area"), count(lit(1)).as("n"))
      .as[(Int, Long, Long)].collect()
    assert(parts.map(_._3).sum == 256L * 256L)
    val avgArea = parts.map(_._2).sum.toDouble / parts.length
    // perfect quadrant split would give 4096/partition; allow 4× slack for
    // range-boundary straddling — far below a stripe layout's 256-wide 16384
    assert(avgArea <= 16000.0,
      s"avg bbox area $avgArea must stay near the quadrant size, " +
        s"not the full-width stripe size")
    parts.foreach { case (_, area, n) =>
      assert(area >= n, "bbox covers its points") }
  }
}
