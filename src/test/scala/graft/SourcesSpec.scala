package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.Files

/** File-format source/sink coverage beyond parquet (the reference uses no
  * file formats at all — SURVEY §2.1; a complete engine needs the standard
  * ones): CSV and JSON-lines round-trips with explicit schemas, plus
  * partitioned-parquet layout with partition pruning. */
class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val sample = Tables.lineitem(spark, sfDir)
    .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    .limit(500)

  test("CSV round-trip with explicit schema and header") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/data"
    sample.write.option("header", "true").csv(dir)
    val back = spark.read
      .schema("l_orderkey LONG, l_partkey LONG, l_quantity DOUBLE, l_returnflag STRING")
      .option("header", "true").csv(dir)
    assert(back.count() == 500)
    assert(back.schema.map(_.dataType) == sample.schema.map(_.dataType))
    val s1 = sample.agg(sum("l_quantity")).collect()(0).getDouble(0)
    val s2 = back.agg(sum("l_quantity")).collect()(0).getDouble(0)
    assert(math.abs(s1 - s2) < 1e-6)
  }

  test("JSON-lines round-trip preserves values") {
    val dir = Files.createTempDirectory("graft-json").toString + "/data"
    sample.write.json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.count() == 500)
    assert(back.except(sample).count() == 0 && sample.except(back).count() == 0)
  }

  test("ORC round-trip with predicate pushdown into the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/data"
    sample.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == 500)
    assert(back.except(sample).count() == 0 && sample.except(back).count() == 0)
    val filtered = back.filter(col("l_orderkey") < 100)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]")
      || scan.toLowerCase.contains("lessthan(l_orderkey"),
      s"ORC scan must receive the pushed filter:\n$scan")
  }

  test("text source reads lines; text sink writes a single string column") {
    val dir = Files.createTempDirectory("graft-text").toString + "/data"
    sample.select(concat_ws("|", col("l_orderkey"), col("l_returnflag")).as("value"))
      .write.text(dir)
    val back = spark.read.text(dir)
    assert(back.count() == 500)
    assert(back.schema.fieldNames.toSeq == Seq("value"))
    assert(back.filter(col("value").rlike("^[0-9]+\\|[A-Z]$")).count() == 500)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-part").toString + "/data"
    Tables.orders(spark, sfDir)
      .withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("status") === "O")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan (no full-table read)
    assert(pruned.count() ==
      Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "O").count())
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      s"expected partition pruning in plan:\n$plan")
  }
}
