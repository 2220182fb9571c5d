package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory,
  EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro wire-format round-trip WITHOUT the `spark-avro` connector (that
  * datasource jar is absent from this image — environmental, carried
  * since round 1 — but Avro CORE is present, because Spark itself
  * depends on it for shuffle/mapred plumbing). This is the
  * `to_avro`/`from_avro` capability pair a Kafka-Avro pipeline needs,
  * built directly on `org.apache.avro`'s GenericDatum machinery:
  *
  *  - [[toAvro]]: DataFrame → (binary `avro` column), one Avro binary
  *    record per row under a schema DERIVED from the Spark schema
  *    (string/long/int/double/float/boolean/binary fields, nullable via
  *    `["null", T]` unions — the standard mapping).
  *  - [[fromAvro]]: the inverse, decoding a binary column back to typed
  *    columns under the same schema.
  *
  * Implemented with `mapPartitions`-style row mapping (the documented
  * last-resort tier): Avro's encoder is imperative per-record and has
  * no Catalyst expression equivalent without the connector jar. The
  * writer/reader/encoder instances are reused across a partition
  * (EncoderFactory reuse), so per-row cost is the Avro serialization
  * itself. Scale shape: narrow map, no shuffle, schema resolved once on
  * the driver and shipped as its JSON string (Schema is not
  * serializable pre-1.12-style — parse per partition).
  *
  * Spec: byte-level determinism + field-exact round-trip on the STEDI
  * customer shape ([[graft.stedi.Schemas]]), including null handling —
  * `AvroCodecSpec`.
  */
object AvroCodec {

  /** Avro record schema JSON for a flat Spark schema (nullable fields
    * become `["null", T]` unions, Avro's idiom). */
  def avroSchemaJson(schema: StructType, name: String = "GraftRecord"): String = {
    def tpe(dt: DataType): String = dt match {
      case StringType => "\"string\""
      case LongType => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case BinaryType => "\"bytes\""
      case other =>
        throw new IllegalArgumentException(
          s"unsupported flat Avro field type: $other")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${tpe(f.dataType)}]"""
        else tpe(f.dataType)
      s"""{"name": "${f.name}", "type": $t}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "$name", "fields": [$fields]}"""
  }

  /** Encode every row of `df` (flat schema) into one Avro binary record;
    * returns (original columns..., `avro` BINARY). */
  def toAvro(df: DataFrame): DataFrame = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    val enc = RowEncoder.encoderFor(
      sparkSchema.add(StructField("avro", BinaryType, nullable = false)))
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(json)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      var benc: BinaryEncoder = null
      rows.map { r =>
        val rec = new GenericData.Record(schema)
        sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
          val v = if (r.isNullAt(i)) null else f.dataType match {
            case StringType => r.getString(i)
            case LongType => java.lang.Long.valueOf(r.getLong(i))
            case IntegerType => java.lang.Integer.valueOf(r.getInt(i))
            case DoubleType => java.lang.Double.valueOf(r.getDouble(i))
            case FloatType => java.lang.Float.valueOf(r.getFloat(i))
            case BooleanType => java.lang.Boolean.valueOf(r.getBoolean(i))
            case BinaryType =>
              java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](i))
            case other => throw new IllegalStateException(other.toString)
          }
          rec.put(f.name, v)
        }
        val out = new ByteArrayOutputStream()
        benc = EncoderFactory.get().binaryEncoder(out, benc)
        writer.write(rec, benc)
        benc.flush()
        Row.fromSeq(r.toSeq :+ out.toByteArray)
      }
    }(enc)
  }

  /** Decode a single binary Avro column back into the flat `schema`'s
    * columns — the inverse of [[toAvro]]. */
  def fromAvro(df: DataFrame, avroCol: String, schema: StructType): DataFrame = {
    val json = avroSchemaJson(schema)
    val enc = RowEncoder.encoderFor(schema)
    df.select(col(avroCol)).mapPartitions { rows =>
      val avroSchema = new Schema.Parser().parse(json)
      val reader = new GenericDatumReader[GenericRecord](avroSchema)
      var dec: BinaryDecoder = null
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](0)
        dec = DecoderFactory.get().binaryDecoder(bytes, dec)
        val rec = reader.read(null, dec)
        Row.fromSeq(schema.fields.map { f =>
          val v = rec.get(f.name)
          if (v == null) null else f.dataType match {
            case StringType => v.toString // Avro Utf8 → String
            case BinaryType =>
              val bb = v.asInstanceOf[java.nio.ByteBuffer]
              val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
            case _ => v
          }
        }.toIndexedSeq)
      }
    }(enc)
  }
}
