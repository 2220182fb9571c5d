package graft.stedi

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.util.Base64

/** Batch replay of the exact STEDI wire payloads (FIXTURES.md §1-4) through
  * the decode chain — asserts the reference's quirks are preserved:
  * missing-field→null, always-null `customer` (schema field mismatch),
  * lenient from_json coercions, null-filter drops non-Customer events. */
class StediTransformsSpec extends SparkSpecBase {
  import spark.implicits._

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  /** Kafka-Connect Redis envelope around a base64 customer JSON, with the
    * redundant lowercase `zsetEntries` twin the reference leaves unparsed. */
  private def envelope(customerJson: String): String = {
    val e = b64(customerJson)
    s"""{"key":"${b64("Customer")}","existType":"NONE","ch":false,"incr":false,
       |"zSetEntries":[{"element":"$e","score":0.0}],
       |"zsetEntries":[{"element":"$e","score":0.0}]}""".stripMargin.replace("\n", "")
  }

  private val samCustomer =
    """{"customerName":"Sam Test","email":"sam.test@test.com","phone":"8015551212","birthDay":"2001-01-03"}"""

  test("P1 decode chain: envelope → {email, birthYear}") {
    val raw = Seq(envelope(samCustomer)).toDF("value")
    val out = Transforms.customerPipeline(raw).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "sam.test@test.com")
    assert(out(0).getString(1) == "2001")
  }

  test("customer column parses to null (customerName/customer field mismatch)") {
    val raw = Seq(envelope(samCustomer)).toDF("value")
    val parsed = (Transforms.castValueAsString _ andThen Transforms.parseRedisEnvelope
      andThen Transforms.extractEncodedCustomer andThen Transforms.decodeBase64Json
      andThen Transforms.parseCustomer)(raw)
    val row = parsed.collect()(0)
    assert(row.isNullAt(parsed.columns.indexOf("customer")),
      "reference schema quirk: wire field is customerName, schema declares customer")
    assert(row.getString(parsed.columns.indexOf("email")) == "sam.test@test.com")
  }

  test("null-filter drops non-Customer redis events") {
    val other = envelope("""{"something":"else"}""")
    val raw = Seq(envelope(samCustomer), other).toDF("value")
    assert(Transforms.customerPipeline(raw).count() == 1)
  }

  test("lenient coercions: ch boolean→string, zSetEntries.score number→string") {
    val raw = Seq(envelope(samCustomer)).toDF("value")
    val env = (Transforms.castValueAsString _ andThen Transforms.parseRedisEnvelope)(raw)
    val row = env.select(col("ch"), col("zSetEntries").getItem(0).getField("score"))
      .collect()(0)
    assert(row.getString(0) == "false")
    assert(row.getString(1) == "0.0")
  }

  test("P2 risk parse: ISO timestamp truncates to DateType, score is float") {
    val risk =
      """{"customer":"Jason.Mitra@test.com","score":7.0,"riskDate":"2020-09-14T07:54:06.417Z"}"""
    val out = Transforms.parseRiskEvent(Seq(risk).toDF("value"))
    val row = out.collect()(0)
    assert(row.getString(0) == "Jason.Mitra@test.com")
    assert(row.getFloat(1) == 7.0f)
    val withDate = Seq(risk).toDF("value")
      .selectExpr("CAST(value AS STRING) value")
      .withColumn("value", from_json(col("value"), Schemas.stediSchema))
      .select(col("value.riskDate"))
    assert(withDate.collect()(0).getDate(0).toString == "2020-09-14")
  }

  test("P3 batch join + to_json matches the stedi-risk output shape") {
    val redisRaw = Seq(envelope(
      """{"customerName":"Santosh Fibonnaci","email":"Santosh.Fibonnaci@test.com","phone":"8015551212","birthDay":"1963-01-03"}"""
    )).toDF("value")
    val riskRaw = Seq(
      """{"customer":"Santosh.Fibonnaci@test.com","score":28.5,"riskDate":"2020-09-14T07:54:06.417Z"}"""
    ).toDF("value")
    val cust = Transforms.customerPipeline(redisRaw)
    val risk = Transforms.parseRiskEvent(riskRaw)
    val joined = Transforms.joinRiskWithCustomer(risk, cust)
    val json = Transforms.toJsonValue(joined).collect()(0).getString(0)
    assert(json.contains(""""customer":"Santosh.Fibonnaci@test.com""""))
    assert(json.contains(""""score":28.5"""))
    assert(json.contains(""""email":"Santosh.Fibonnaci@test.com""""))
    assert(json.contains(""""birthYear":"1963""""))
  }
}
