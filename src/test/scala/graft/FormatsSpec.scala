package graft

/** Source/sink format breadth beyond the parquet+text+Hive paths the
  * pipelines use: ORC, CSV, and JSON round-trips on real fixture rows
  * — the remaining batch formats a lake migration meets. Parquet is
  * exercised by every query; the streaming text/parquet/table sinks
  * by SinksSpec/JobsSpec. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  // ordered before the limit: each test plans `sample` twice (write,
  // then expected-set collect) and an unordered limit(200) has no
  // cross-job row-set guarantee
  private def sample = spark.read
    .parquet(s"$sf0001/lineitem.parquet")
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    .orderBy("l_orderkey", "l_linenumber")
    .limit(200)

  test("ORC round-trip preserves rows and types") {
    val dir = tmpDir("orc")
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == sample.schema)
    assert(back.collect().toSet == sample.collect().toSet)
  }

  test("CSV round-trip with header + explicit schema") {
    val dir = tmpDir("csv")
    sample.write.mode("overwrite").option("header", true).csv(dir)
    // CSV is untyped on disk — the reader must be given the schema
    // (schema inference at 100 TB means an extra full scan)
    val back = spark.read.option("header", true)
      .schema(sample.schema).csv(dir)
    assert(back.collect().toSet == sample.collect().toSet)
  }

  test("JSON-lines round-trip with explicit schema") {
    val dir = tmpDir("json")
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.collect().toSet == sample.collect().toSet)
  }
}
