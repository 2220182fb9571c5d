package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: keys that decide where rows LIVE, not what
  * they compute.
  *
  * Z-order (Morton) interleaving maps two clustering dimensions onto one
  * sort key whose curve preserves locality in BOTH dimensions — writing a
  * 100 TB table `repartitionByRange(zkey).sortWithinPartitions(zkey)`
  * gives every parquet row group a tight min/max envelope on each source
  * column, so predicates on EITHER dimension skip files (plain sorting
  * gives that for the leading column only). The interleave is pure integer
  * bit arithmetic — engine-portable, codegen'd, zero shuffle to compute.
  */
object LayoutOps {

  /** 32-bit Morton key from two 16-bit dimensions: bit i of `x` lands at
    * position 2i, bit i of `y` at 2i+1. Inputs are masked to 16 bits —
    * callers bucket/normalize real columns into [0, 65535] first (the key
    * orders buckets, so coarse is fine). */
  def zorder16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** The matching DuckDB SQL fragment (oracle mirror of [[zorder16]]). */
  def zorder16Sql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)}) + " +
        s"((($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** Cluster `df` on the z-curve of two bucketed dimensions: range
    * partition + in-partition sort by the Morton key. Each output
    * partition then covers a compact z-range ⇒ tight per-file min/max on
    * both source columns (the data-skipping contract). */
  def zorderCluster(df: DataFrame, x: Column, y: Column,
      numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("__zkey", zorder16(x, y))
    keyed.repartitionByRange(numPartitions, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }

  /** Compaction result: input/output file counts and the bytes seen. */
  final case class CompactStats(filesBefore: Int, bytesBefore: Long,
      filesOut: Int)

  /** Small-file compaction (the lakehouse maintenance job): rewrite a
    * parquet directory's many small files as ⌈bytes/target⌉ right-sized
    * ones. Streaming sinks and fine-grained ingest produce file counts
    * that grow per-batch; at 100 TB the *file count*, not the bytes, is
    * what kills scan planning (one task + one open per file, NameNode/
    * listing pressure). Output goes to `outDir` — production swaps it in
    * atomically (rename/metastore pointer flip); compact-in-place would
    * lose data on failure mid-write.
    *
    * Sizing note: ⌈on-disk bytes/target⌉ partitions each re-encode to
    * roughly `target` because compaction preserves encoding ratios —
    * that heuristic needs no second pass over the data. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, dir: String,
      outDir: String, targetBytes: Long): CompactStats = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1L) / targetBytes).toInt
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    CompactStats(files.length, bytes, outFiles)
  }
}
