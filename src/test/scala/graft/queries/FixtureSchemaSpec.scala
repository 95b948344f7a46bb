package graft.queries

import graft.etl.EtlSpecBase
import org.apache.spark.sql.types._

/** Canary for driver fixture drift (VERDICT r8 #5).
  *
  * Round 8 proved the driver will regenerate `/root/testdata` under us
  * mid-build: `events.parquet` silently moved from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS) and 23 queries died at plan time. This spec pins
  * every assumption the engine makes about the fixtures' schemas so the
  * NEXT drift fails one named test instead of a fleet of queries.
  *
  * It asserts the LOGICAL schema each table presents after
  * `Tables.read` — i.e. the contract the 124 queries compile against —
  * plus the ts-normalization invariant for all physical encodings of
  * `events.ts` the driver has shipped so far.
  */
class FixtureSchemaSpec extends EtlSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def schemaOf(name: String): Map[String, DataType] =
    Tables.read(spark, sfDir, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  test("events arrives with TimestampType ts regardless of footer encoding") {
    val s = schemaOf("events")
    assert(s("ts") === TimestampType,
      s"events.ts must normalize to TimestampType, got ${s("ts")} — " +
        "fixture format drifted; adapt Tables.normalizeTs")
    assert(s("event_id") === LongType)
    assert(s("user_id") === LongType)
    assert(s("event_type") === StringType)
    assert(s("value") === DoubleType)
    assert(s("props") === StringType)
  }

  test("documents schema matches the text-pipeline contract") {
    val s = schemaOf("documents")
    assert(s("doc_id") === LongType)
    assert(s("text") === StringType)
    assert(s("lang") === StringType)
    assert(s("source") === StringType)
    assert(s("n_chars") === LongType)
  }

  test("embeddings schema matches the similarity contract") {
    val s = schemaOf("embeddings")
    assert(s("vec_id") === LongType)
    s("embedding") match {
      case ArrayType(FloatType, _) => ()
      case other => fail(s"embeddings.embedding must be array<float>, got $other")
    }
    assert(s("label") === IntegerType)
  }

  test("tpch key and date columns keep their read types") {
    val li = schemaOf("lineitem")
    assert(li("l_orderkey") === LongType)
    assert(li("l_quantity") === DoubleType)
    // The driver writes dates as TIMESTAMP(MICROS, isAdjustedToUTC=false);
    // Spark's NTZ inference surfaces them as TIMESTAMP_NTZ and every
    // date-bucketing query (q29, q104, q117, ...) was oracled on that.
    assert(li("l_shipdate") === TimestampNTZType,
      s"l_shipdate drifted to ${li("l_shipdate")}")
    val o = schemaOf("orders")
    assert(o("o_orderkey") === LongType)
    assert(o("o_orderdate") === TimestampNTZType,
      s"o_orderdate drifted to ${o("o_orderdate")}")
    assert(schemaOf("customer")("c_custkey") === LongType)
    assert(schemaOf("customer")("c_nationkey") === IntegerType)
    assert(schemaOf("nation")("n_nationkey") === IntegerType)
  }

  test("normalizeTs handles every historical ts encoding") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // NANOS-era path: raw long of epoch nanos.
    val nanos = Seq(1704067200123456789L).toDF("ts")
    val fromNanos = Tables.normalizeTs(nanos)
    assert(fromNanos.schema("ts").dataType === TimestampType)
    // Integer-division truncation, not rounding: …789 ns -> …456 µs.
    assert(fromNanos.select(unix_micros(col("ts"))).head.getLong(0)
      === 1704067200123456L)
    // MICROS-era path: TIMESTAMP_NTZ from the parquet NTZ inference.
    val ntz = Seq(1704067200123456L).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val fromNtz = Tables.normalizeTs(ntz)
    assert(fromNtz.schema("ts").dataType === TimestampType)
    // Session tz is UTC, so the NTZ wall value maps to the same instant.
    assert(fromNtz.select(unix_micros(col("ts"))).head.getLong(0)
      === 1704067200123456L)
    // Already-TimestampType: identity.
    val tz = Seq(1704067200123456L).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(Tables.normalizeTs(tz) eq tz)
  }
}
