package graft.stedi

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure `DataFrame => DataFrame` transforms, one per operator of the STEDI
  * pipelines (SURVEY.md §2). Composable so the same logic runs over a Kafka
  * stream, a `MemoryStream`, or a batch fixture — the Catalyst plan is
  * identical either way (all built-in expressions, fully codegen'd, no UDFs).
  *
  * Each function cites the reference call site it re-expresses.
  */
object Transforms {

  /** Kafka's binary `value` → UTF-8 string
    * (`sparkpykafkajoin.py:72`, `selectExpr("cast(value as string) value")`). */
  def castValueAsString(df: DataFrame): DataFrame =
    df.selectExpr("CAST(value AS STRING) value")

  /** Parse the Kafka-Connect Redis envelope and flatten it
    * (`sparkpykafkajoin.py:105-107`: `from_json` + `select(col("value.*"))`). */
  def parseRedisEnvelope(df: DataFrame): DataFrame =
    df.withColumn("value", from_json(col("value"), Schemas.redisSchema))
      .select(col("value.*"))

  /** `zSetEntries[0].element` → `encodedCustomer`
    * (`sparkpykafkajoin.py:111-113`, SQL array subscript + struct field). */
  def extractEncodedCustomer(df: DataFrame): DataFrame =
    df.select(col("key"), col("zSetEntries").getItem(0).getField("element")
      .as("encodedCustomer"))

  /** base64 → binary → UTF-8 string (`sparkpykafkajoin.py:121-123`). */
  def decodeBase64Json(df: DataFrame): DataFrame =
    df.withColumn("customer", unbase64(col("encodedCustomer")).cast("string"))

  /** Parse the inner Customer JSON and flatten
    * (`sparkpykafkajoin.py:133-135`). Missing wire fields parse to null —
    * including the always-null `customer` column (schema quirk, see
    * [[Schemas.customerSchema]]). */
  def parseCustomer(df: DataFrame): DataFrame =
    df.withColumn("customer", from_json(col("customer"), Schemas.customerSchema))
      .select(col("customer.*"))

  /** Drop non-Customer Redis events whose decoded JSON lacks email/birthDay
    * (`sparkpykafkajoin.py:138-149`, SQL `WHERE email IS NOT NULL AND
    * birthDay IS NOT NULL`). */
  def filterValidCustomers(df: DataFrame): DataFrame =
    df.filter(col("email").isNotNull && col("birthDay").isNotNull)

  /** `birthYear = split(birthDay, "-")[0]`, keep `{email, birthYear}`
    * (`sparkpykafkajoin.py:152-154`). */
  def extractBirthYear(df: DataFrame): DataFrame =
    df.select(col("email"),
      split(col("birthDay"), "-").getItem(0).as("birthYear"))

  /** Full P1 decode chain: raw Kafka `value` → `{email, birthYear}`
    * (`sparkpyrediskafkastreamtoconsole.py:63-155`). Stateless and narrow:
    * at any scale this pipelines into one whole-stage-codegen'd task per
    * source partition — no shuffle. */
  val customerPipeline: DataFrame => DataFrame =
    castValueAsString _ andThen parseRedisEnvelope andThen
      extractEncodedCustomer andThen decodeBase64Json andThen parseCustomer andThen
      filterValidCustomers andThen extractBirthYear

  /** P2: parse `stedi-events` risk events → `{customer, score}`
    * (`sparkpyeventskafkastreamtoconsole.py:38-61`). */
  def parseRiskEvent(df: DataFrame): DataFrame =
    df.selectExpr("CAST(value AS STRING) value")
      .withColumn("value", from_json(col("value"), Schemas.stediSchema))
      .select(col("value.customer"), col("value.score"))

  /** P3: stream-stream INNER equi-join on `email = customer`
    * (`sparkpykafkajoin.py:196-198`). Parity mode: no watermark — join state
    * grows unboundedly, late data never dropped (reference behavior).
    *
    * At scale this is a `StreamingSymmetricHashJoinExec`: both sides shuffle
    * on the key; state lives per-partition. For the 100 TB goal run with the
    * RocksDB state store and the watermarked variant below. */
  def joinRiskWithCustomer(risk: DataFrame, customer: DataFrame): DataFrame =
    risk.join(customer, expr("email = customer"))

  /** Hardened variant: watermarks bound join state. Documented divergence
    * from the reference: customers/risk events arriving later than the
    * watermark delay are dropped (SURVEY.md §7 "what's hard").
    *
    * Watermarks ALONE never bound an inner equi-join's state — the engine
    * can't prove when a match stops being possible, so it retains every
    * row exactly like the unwatermarked parity join (StediStreamingSpec's
    * offline state-store audit demonstrates both behaviors). The `__cts
    * BETWEEN __ts ± delay` event-time constraint is what closes each
    * row's match window and lets its state evict; it also narrows
    * semantics to versions within `delay` of the event — the trade a
    * bounded-state production join makes. */
  def joinRiskWithCustomerWatermarked(
      risk: DataFrame, riskTs: Column, customer: DataFrame, custTs: Column,
      delay: String): DataFrame = {
    val r = risk.withColumn("__ts", riskTs).withWatermark("__ts", delay)
    val c = customer.withColumn("__cts", custTs).withWatermark("__cts", delay)
    r.join(c,
      expr(s"email = customer AND __cts BETWEEN __ts - INTERVAL $delay" +
        s" AND __ts + INTERVAL $delay"))
      .drop("__ts", "__cts")
  }

  /** LEFT OUTER stream-stream join (beyond the reference's inner join):
    * risk events with no matching customer are emitted null-padded once the
    * watermark guarantees no match can still arrive. Structured Streaming
    * requires BOTH watermarks AND an event-time bound in the condition for
    * outer joins — the bound is what lets the engine prove a row's match
    * window has closed and evict its state. */
  def joinRiskWithCustomerLeftOuter(
      risk: DataFrame, riskTs: Column, customer: DataFrame, custTs: Column,
      delay: String): DataFrame = {
    val r = risk.withColumn("__ts", riskTs).withWatermark("__ts", delay)
    val c = customer.withColumn("__cts", custTs).withWatermark("__cts", delay)
    r.join(c,
      expr(s"email = customer AND __cts BETWEEN __ts - INTERVAL $delay AND __ts + INTERVAL $delay"),
      "left_outer")
  }

  /** FULL OUTER stream-stream join: unmatched rows from EITHER side emit
    * null-padded once the watermark closes their match window — risk events
    * with no customer AND customers who never produced a risk event both
    * surface (the audit view of the feed). Same watermark + event-time
    * bound requirements as the left-outer variant. */
  def joinRiskWithCustomerFullOuter(
      risk: DataFrame, riskTs: Column, customer: DataFrame, custTs: Column,
      delay: String): DataFrame = {
    val r = risk.withColumn("__ts", riskTs).withWatermark("__ts", delay)
    val c = customer.withColumn("__cts", custTs).withWatermark("__cts", delay)
    r.join(c,
      expr(s"email = customer AND __cts BETWEEN __ts - INTERVAL $delay AND __ts + INTERVAL $delay"),
      "full_outer")
  }

  /** Reserialize all columns as one JSON `value` for the Kafka sink
    * (`sparkpykafkajoin.py:212`, `TO_JSON(struct(*))`). */
  def toJsonValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
}
