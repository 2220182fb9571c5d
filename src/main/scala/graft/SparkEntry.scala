package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Column names are aliased
  * identically in the Spark plan and the DuckDB oracle SQL, every query
  * has a total ORDER BY, and cross-row double aggregation goes through
  * exact DECIMAL — see the module scaladocs for the determinism contract.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * STEDI P3 shape: risk-event stream (events) ⋈ customer dimension
    * (broadcast), reserialized to JSON — the reference's
    * `sparkpykafkajoin.py:196-218` re-expressed over the batch corpus. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    val cust = Tables.customer(spark, d)
    val joined = ev.join(broadcast(cust), ev("user_id") === cust("c_custkey"))
      .select(col("c_name").as("customer"), round(col("value"), 2).as("score"),
        col("c_custkey").as("custkey"), col("event_type"))
    joined.select(to_json(struct(joined.columns.map(col).toIndexedSeq: _*)).as("value"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data-pipeline extension surface). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    StediQueries.queries ++ RelationalQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — every query has one (the LSH oracle embeds
    * its hyperplane weights as SQL literals). */
  def oracleSql: Map[String, String] =
    StediQueries.oracles ++ RelationalQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++
      MultimodalQueries.oracles ++ PipelineQueries.oracles
}
