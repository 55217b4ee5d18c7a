package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine's expectations against the driver testdata's actual
  * parquet footers (TESTDATA.md). The driver regenerates these files between
  * rounds and has changed column encodings before (events.ts went from
  * TIMESTAMP(NANOS) to timestamp[us] between r7 and r8, crashing 57 queries).
  * One failed assertion here is the cheap early warning for that class of
  * change; each assertion names the Spark-decoded type(s) the engine's
  * loaders can absorb.
  */
class SchemaContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  /** Spark-decoded field types, as `Tables.apply` would see them (with the
    * nanos legacy flag on, matching `Tables.events`). */
  private def decoded(table: String): Map[String, DataType] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$table.parquet").schema
      .fields.map(f => f.name -> f.dataType).toMap
  }

  private val timestampish: Set[DataType] = Set(LongType, TimestampNTZType, TimestampType)

  private def check(table: String, expected: Map[String, Set[DataType]]): Unit = {
    val actual = decoded(table)
    expected.foreach { case (col, ok) =>
      assert(actual.contains(col), s"$table.$col missing; footer has ${actual.keys.toSeq.sorted}")
      assert(ok.contains(actual(col)),
        s"$table.$col decoded as ${actual(col)}; engine absorbs only ${ok.mkString("/")}")
    }
  }

  test("region/nation footer contract") {
    check("region", Map("r_regionkey" -> Set(IntegerType, LongType), "r_name" -> Set(StringType)))
    check("nation", Map(
      "n_nationkey" -> Set(IntegerType, LongType),
      "n_name"      -> Set(StringType),
      "n_regionkey" -> Set(IntegerType, LongType)))
  }

  test("customer/supplier/part footer contract") {
    check("customer", Map(
      "c_custkey"    -> Set(LongType, IntegerType),
      "c_name"       -> Set(StringType),
      "c_nationkey"  -> Set(IntegerType, LongType),
      "c_acctbal"    -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)))
    check("supplier", Map(
      "s_suppkey"   -> Set(LongType, IntegerType),
      "s_name"      -> Set(StringType),
      "s_nationkey" -> Set(IntegerType, LongType),
      "s_acctbal"   -> Set(DoubleType)))
    check("part", Map(
      "p_partkey"     -> Set(LongType, IntegerType),
      "p_name"        -> Set(StringType),
      "p_brand"       -> Set(StringType),
      "p_type"        -> Set(StringType),
      "p_size"        -> Set(IntegerType, LongType),
      "p_retailprice" -> Set(DoubleType)))
  }

  test("orders/lineitem footer contract") {
    check("orders", Map(
      "o_orderkey"      -> Set(LongType, IntegerType),
      "o_custkey"       -> Set(LongType, IntegerType),
      "o_orderstatus"   -> Set(StringType),
      "o_totalprice"    -> Set(DoubleType),
      "o_orderdate"     -> (timestampish ++ Set[DataType](DateType)),
      "o_orderpriority" -> Set(StringType)))
    check("lineitem", Map(
      "l_orderkey"      -> Set(LongType, IntegerType),
      "l_partkey"       -> Set(LongType, IntegerType),
      "l_suppkey"       -> Set(LongType, IntegerType),
      "l_linenumber"    -> Set(IntegerType, LongType),
      "l_quantity"      -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType),
      "l_discount"      -> Set(DoubleType),
      "l_tax"           -> Set(DoubleType),
      "l_returnflag"    -> Set(StringType),
      "l_linestatus"    -> Set(StringType),
      "l_shipdate"      -> (timestampish ++ Set[DataType](DateType))))
  }

  test("events footer contract: ts is one of the three encodings Tables.events absorbs") {
    check("events", Map(
      "event_id"   -> Set(LongType, IntegerType),
      "ts"         -> timestampish,
      "user_id"    -> Set(LongType, IntegerType),
      "event_type" -> Set(StringType),
      "value"      -> Set(DoubleType),
      "props"      -> Set(StringType)))
  }

  test("documents/embeddings footer contract") {
    check("documents", Map(
      "doc_id"  -> Set(LongType, IntegerType),
      "text"    -> Set(StringType),
      "lang"    -> Set(StringType),
      "source"  -> Set(StringType),
      "n_chars" -> Set(LongType, IntegerType)))
    val emb = decoded("embeddings")
    assert(emb("vec_id") == LongType || emb("vec_id") == IntegerType)
    assert(emb("label") == IntegerType || emb("label") == LongType)
    emb("embedding") match {
      case ArrayType(FloatType | DoubleType, _) => ()
      case other => fail(s"embeddings.embedding decoded as $other; engine absorbs only array<float|double>")
    }
  }

  test("Tables.events normalizes ts to canonical TimestampType") {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }

  test("normalizeTs absorbs all three encodings and rejects others") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // LongType nanos path
    val nanos = Seq(1700000000123456789L).toDF("ts")
    val fromNanos = Tables.normalizeTs(nanos)
    assert(fromNanos.schema("ts").dataType == TimestampType)
    // floor to µs: 1700000000123456 µs
    assert(fromNanos.select(unix_micros(col("ts"))).as[Long].head() == 1700000000123456L)
    // NTZ path — UTC session tz makes the cast value-preserving
    val ntz = Seq(1700000000123456L).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(Tables.normalizeTs(ntz).select(unix_micros(col("ts"))).as[Long].head() == 1700000000123456L)
    // already-canonical path is a no-op
    val canon = Seq(1700000000123456L).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(Tables.normalizeTs(canon).select(unix_micros(col("ts"))).as[Long].head() == 1700000000123456L)
    // anything else fails loudly
    val bad = Seq("2023-01-01").toDF("ts")
    intercept[IllegalStateException](Tables.normalizeTs(bad))
  }
}
