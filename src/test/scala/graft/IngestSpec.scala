package graft

import graft.engine.Ingest
import org.apache.spark.sql.functions._

/** JSON decode semantics vs the reference's two paths
  * (Kafka2S3Hive.scala:77-78 lenient; Kafka2S3Parquet.scala:70-73
  * fastjson strict). Edge-case literals from FIXTURES.md §A1. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    """{"uuid":"u1","date":"2021-04-13T06:23:10.593Z","timestamp":1617171790593,"ad_type":1,"ad_type_name":"a"}"""
  private val partial = """{"uuid":"u2","timestamp":1617171790593}"""
  private val corrupt = "not-json-at-all"

  test("lenient: corrupt rows dropped, missing fields null (Flink parity)") {
    val out = Ingest.parseLenient(
      Seq(good, partial, corrupt).toDF("value"))
    val rows = out.orderBy("uuid").collect()
    // corrupt row is DROPPED ('json.ignore-parse-errors'='true' skips it)
    assert(rows.length == 2)
    val u2 = rows(1)
    assert(u2.getAs[String]("uuid") == "u2")
    assert(u2.isNullAt(u2.fieldIndex("date")))       // missing → null
    assert(u2.isNullAt(u2.fieldIndex("ad_type")))    // missing → null
    assert(u2.getAs[Long]("timestamp") == 1617171790593L)
  }

  test("strict: missing primitives get fastjson defaults (0 / 0L)") {
    val out = Ingest.parseStrict(Seq(partial).toDF("value")).collect()(0)
    assert(out.getAs[String]("uuid") == "u2")
    assert(out.getAs[Int]("ad_type") == 0)        // fastjson int default
    assert(out.getAs[Long]("timestamp") == 1617171790593L)
    assert(out.isNullAt(out.fieldIndex("date")))  // object fields stay null
  }

  test("strict: malformed JSON throws (fastjson parity)") {
    assertThrows[Exception] {
      Ingest.parseStrict(Seq(corrupt).toDF("value")).collect()
    }
  }

  test("withPartitionColumns derives the reference insert projection") {
    val r = Ingest.withPartitionColumns(
        Ingest.parseLenient(Seq(good).toDF("value"))).collect()(0)
    assert(r.getAs[String]("logday") == "2021-03-31") // from timestamp!
    assert(r.getAs[String]("h") == "06")
    assert(r.getAs[String]("m") == "23")
    assert(r.getAs[String]("date") == "2021-04-13T06:23:10.593Z")
  }
}
