package graft

import org.apache.spark.sql.types._

/** Testdata schema-drift canary (round-8 postmortem): the driver
  * regenerates `/root/testdata` between rounds and has already changed
  * column types once (`events.ts` TIMESTAMP(NANOS) → timestamp[us]), which
  * silently broke 35 queries at the correctness gate. This spec pins every
  * type assumption the `Tables` readers and the oracle SQL bake in, so the
  * next silent swap fails ONE named test with a clear message instead of
  * dozens of opaque query errors.
  *
  * Each assertion names the consumer that depends on it. When a vintage
  * legitimately changes, extend the accepted set here AND make the reader
  * adapt (see Tables.events / Tables.embeddings for the pattern).
  */
class SchemaDriftSpec extends SparkSpec {

  private def raw(name: String) = spark.read.parquet(s"$sf/$name.parquet")

  private def field(table: String, col: String): DataType = {
    val sch = raw(table).schema
    assert(sch.fieldNames.contains(col),
      s"$table.parquet lost column '$col' — schema is now ${sch.simpleString}")
    sch(col).dataType
  }

  private def assertIntegral(table: String, col: String, consumer: String): Unit = {
    val dt = field(table, col)
    assert(dt == LongType || dt == IntegerType,
      s"$table.$col is $dt, expected an integral type — $consumer assumes it")
  }

  private def assertType(table: String, col: String, expected: Set[DataType],
      consumer: String): Unit = {
    val dt = field(table, col)
    assert(expected.contains(dt),
      s"$table.$col drifted to $dt (accepted: ${expected.mkString(", ")}) — $consumer")
  }

  test("events.ts is a vintage Tables.events understands") {
    // nanos-as-long never surfaces unless the conf is set, so check the
    // footer through the same reader config the engine uses
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assertType("events", "ts", Set(LongType, TimestampType, TimestampNTZType),
      "Tables.events branches on exactly these three (Tables.scala)")
    // and the adaptive reader must surface a true TIMESTAMP whatever the vintage
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType,
      "Tables.events no longer normalizes ts to TIMESTAMP — every date/interval consumer breaks")
  }

  test("events value/id/props types hold") {
    assertIntegral("events", "event_id", "timestamp_ns orders by it; sinks round-trip it")
    assertIntegral("events", "user_id", "funnel/retention/sessionize key on it")
    assertType("events", "value", Set(DoubleType),
      "Exact decimal-sum oracles cast from DOUBLE semantics")
    assertType("events", "event_type", Set(StringType), "group keys")
    assertType("events", "props", Set(StringType),
      "the VARIANT/JSON family parses props as a JSON string")
  }

  test("documents types hold") {
    assertIntegral("documents", "doc_id", "every dedup/sampling op keys and md5-draws on it")
    assertType("documents", "text", Set(StringType), "all text kernels")
    assertType("documents", "lang", Set(StringType), "stratified sampling, ngram profiles")
    assertType("documents", "source", Set(StringType), "mixing, decontamination split")
    assertIntegral("documents", "n_chars", "url_host_stats, curation budgets sum it")
  }

  test("embeddings types hold") {
    assertIntegral("embeddings", "vec_id", "ANN probe filters compare it to literals")
    val dt = field("embeddings", "embedding")
    val ok = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    assert(ok, s"embeddings.embedding drifted to $dt — Tables.embeddings can pin " +
      "array<float> (DotScaled) only from float/double element types")
    assert(Tables.embeddings(spark, sf).schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = true) ||
      Tables.embeddings(spark, sf).schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = false),
      "Tables.embeddings no longer surfaces array<float> — DotScaled kernels fail analysis")
  }

  test("orders/lineitem numeric and date types hold") {
    assertIntegral("orders", "o_orderkey", "join keys, sf1 synth id interleave")
    assertType("orders", "o_totalprice", Set(DoubleType),
      "Exact.sqlSum treats money as DOUBLE→DECIMAL; a decimal vintage needs new casts")
    assertType("orders", "o_orderdate", Set(TimestampType, TimestampNTZType, DateType),
      "monthly_revenue truncs it; all three behave under UTC")
    assertType("lineitem", "l_extendedprice", Set(DoubleType), "pricing_summary Exact sums")
    assertType("lineitem", "l_quantity", Set(DoubleType), "q1-style sums")
    assertType("lineitem", "l_shipdate", Set(TimestampType, TimestampNTZType, DateType),
      "shipdate range filters")
    assertIntegral("lineitem", "l_linenumber", "quantile sketch hashes (orderkey, linenumber)")
  }

  test("every remaining oracle-typed column holds (round-10 full-enumeration sweep)") {
    // join/group keys the oracle SQL compares or sums — integral
    assertIntegral("orders", "o_custkey", "join_top_customers groups on it")
    assertIntegral("lineitem", "l_orderkey", "pricing joins / quantile hash keys")
    assertIntegral("lineitem", "l_partkey", "star-join extensions")
    assertIntegral("lineitem", "l_suppkey", "star-join extensions")
    assertIntegral("embeddings", "label", "embed_kmeans / quantize group on it")
    // money-like doubles the Exact decimal-sum machinery casts from
    assertType("customer", "c_acctbal", Set(DoubleType),
      "join_segment_priority Exact-sums it")
    assertType("lineitem", "l_discount", Set(DoubleType),
      "pricing_summary disc_price = price*(1-disc) in scaled-integer space")
    assertType("lineitem", "l_tax", Set(DoubleType),
      "pricing_summary charge term")
    // string group keys / flags the oracles GROUP BY or filter on
    assertType("region", "r_name", Set(StringType), "join_revenue_by_nation filters EUROPE")
    assertType("nation", "n_name", Set(StringType), "revenue rollup group key")
    assertType("customer", "c_name", Set(StringType), "top-customer output column")
    assertType("customer", "c_mktsegment", Set(StringType), "join_segment_priority group key")
    assertType("orders", "o_orderstatus", Set(StringType), "status CASE projections")
    assertType("orders", "o_orderpriority", Set(StringType), "segment-priority group key")
    assertType("lineitem", "l_returnflag", Set(StringType), "pricing_summary group key")
    assertType("lineitem", "l_linestatus", Set(StringType), "pricing_summary group key")
  }

  test("tpch dimension keys hold") {
    assertIntegral("region", "r_regionkey", "star joins")
    assertIntegral("nation", "n_nationkey", "star joins")
    assertIntegral("nation", "n_regionkey", "star joins")
    assertIntegral("customer", "c_custkey", "star joins")
    assertIntegral("customer", "c_nationkey", "star joins")
    assertIntegral("supplier", "s_suppkey", "star joins")
    assertIntegral("part", "p_partkey", "star joins")
  }
}
