package graft.stedi

import org.apache.spark.sql.types._

/** Wire schemas of the STEDI human-balance pipeline, re-declared from the
  * reference (`/root/reference/sparkpykafkajoin.py:16-53`). The deliberately
  * lenient typings are preserved:
  *
  *  - `ch` is declared STRING although the wire value is a JSON boolean
  *    (`sparkpykafkajoin.py:20` vs payload `README.md:63`) — `from_json`
  *    coerces leniently.
  *  - `zSetEntries[*].score` is declared STRING although the wire value is a
  *    JSON number (`sparkpykafkajoin.py:30`).
  *  - `customerSchema` declares `customer` where the wire field is
  *    `customerName` (`sparkpykafkajoin.py:39` vs `README.md:84`), so the
  *    parsed `customer` column is always null; only `email`/`birthDay` are
  *    used downstream (`sparkpykafkajoin.py:152-154`).
  *  - `riskDate` is DATE although the wire carries an ISO-8601 timestamp
  *    string (`README.md:101`); parsing truncates to the date.
  */
object Schemas {

  /** Kafka-Connect Redis envelope on topic `redis-server`
    * (`sparkpykafkajoin.py:16-34`). The redundant lowercase `zsetEntries`
    * twin in the wire payload is intentionally NOT declared
    * (`sparkpykafkajoin.py:95`). */
  val redisSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("existType", StringType),
    StructField("ch", StringType),      // lenient: wire is JSON bool
    StructField("incr", BooleanType),
    StructField("zSetEntries", ArrayType(StructType(Seq(
      StructField("element", StringType),
      StructField("score", StringType)  // lenient: wire is JSON number
    ))))
  ))

  /** Base64-decoded Customer record inside `zSetEntries[0].element`
    * (`sparkpykafkajoin.py:37-44`). `customer` never matches the wire's
    * `customerName` → parses to null (preserved quirk). */
  val customerSchema: StructType = StructType(Seq(
    StructField("customer", StringType),
    StructField("email", StringType),
    StructField("phone", StringType),
    StructField("birthDay", StringType)
  ))

  /** Risk event on topic `stedi-events` (`sparkpykafkajoin.py:47-53`). */
  val stediSchema: StructType = StructType(Seq(
    StructField("customer", StringType),
    StructField("score", FloatType),
    StructField("riskDate", DateType)
  ))

  // Typed views for Dataset[T] pipelines where compile-time safety helps.
  final case class ZSetEntry(element: String, score: String)
  final case class RedisEnvelope(key: String, existType: String, ch: String,
                                 incr: java.lang.Boolean,
                                 zSetEntries: Seq[ZSetEntry])
  final case class CustomerRecord(customer: String, email: String,
                                  phone: String, birthDay: String)
  final case class RiskEvent(customer: String, score: java.lang.Float,
                             riskDate: java.sql.Date)
  final case class EmailBirthYear(email: String, birthYear: String)
  final case class RiskWithBirthYear(customer: String, score: java.lang.Float,
                                     email: String, birthYear: String)
}
