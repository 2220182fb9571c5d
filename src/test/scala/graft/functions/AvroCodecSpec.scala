package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The connector-free Avro round-trip must be lossless and
  * deterministic: decode(encode(rows)) ≡ rows field-for-field
  * (including nulls through the `["null", T]` unions), and encoding the
  * same rows twice yields the same bytes (Avro binary encoding is
  * canonical for a fixed writer schema — no map ordering, no padding). */
class AvroCodecSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("customer", StringType, nullable = true),
    StructField("email", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("birth_year", LongType, nullable = true),
    StructField("active", BooleanType, nullable = false)))

  private def fixture = {
    val rows = Seq(
      Row("Santosh.Fibonnaci@test.com", "s.f@test.com", 4.5, 1973L, true),
      Row(null, "gail.b@test.com", -2.25, null, false),
      Row("Trevor.Huey@test.com", null, 0.0, 2000L, true))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("avro round-trip is lossless, null-safe, and byte-deterministic") {
    val encoded = AvroCodec.toAvro(fixture)
    assert(encoded.schema.fieldNames.last == "avro")
    val bytes = encoded.select(col("email"), col("avro")).collect()
      .map(r => Option(r.getString(0)) -> r.getAs[Array[Byte]](1).toSeq)
      .toMap
    assert(bytes.values.forall(_.nonEmpty))
    // determinism: a second encode produces identical bytes per row
    val bytes2 = AvroCodec.toAvro(fixture)
      .select(col("email"), col("avro")).collect()
      .map(r => Option(r.getString(0)) -> r.getAs[Array[Byte]](1).toSeq)
      .toMap
    assert(bytes == bytes2, "avro encoding must be deterministic")

    val decoded = AvroCodec.fromAvro(encoded, "avro", schema)
    val got = decoded.collect().map(_.toSeq).toSet
    val want = fixture.collect().map(_.toSeq).toSet
    assert(got == want, s"round-trip mismatch:\n$got\nvs\n$want")
  }

  test("derived schema maps nullability to avro unions") {
    val json = AvroCodec.avroSchemaJson(schema)
    assert(json.contains(""""name": "customer", "type": ["null", "string"]"""))
    assert(json.contains(""""name": "active", "type": "boolean""""))
  }

  test("events-shaped stream payloads survive the trip at corpus scale") {
    // the realistic use: serialize the STEDI risk-event join output to
    // avro for a Kafka-Avro sink, decode on the consumer side
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type").cast("string").as("event_type"),
        col("value").cast("double").as("value"))
    val sch = ev.schema
    val back = AvroCodec.fromAvro(AvroCodec.toAvro(ev), "avro", sch)
    val want = ev.collect().map(_.toSeq)
      .sortBy(_.mkString("|")).toSeq
    val got = back.collect().map(_.toSeq)
      .sortBy(_.mkString("|")).toSeq
    assert(got.size == want.size && got == want)
  }
}
