package graft

import graft.engine.TimeOps
import org.apache.spark.sql.functions._
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** F1–F6 expression semantics vs the reference
  * (Kafka2S3Hive.scala:69,123-125; Kafka2S3Parquet.scala:27-34;
  * Kafka2S3Text.scala:54-58). Fixtures from FIXTURES.md §A1; the
  * property checks run 500 seeded random epochs through one job and
  * compare against direct java.time computation (the reference's own
  * mechanism). */
class TimeOpsSpec extends SparkSpec {
  import spark.implicits._

  // 500 seeded epochs, 2000-01-01..2100-01-01, millis granularity
  private val randomEpochs: Seq[Long] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(500)(946684800000L + math.abs(rnd.nextLong()) % 3155760000000L)
  }

  test("F3: epoch millis → secs uses integer division (reference `/1000`)") {
    val r = Seq(1617171790593L, 999L, 0L).toDF("ms")
      .select(TimeOps.epochMillisToSecs(col("ms"))).as[Long].collect()
    assert(r.toSeq == Seq(1617171790L, 0L, 0L))
  }

  test("F1∘F2∘F3: canonical record's event_time is 2021-03-31 06:23:10 UTC") {
    // README.md:11 sample: timestamp=1617171790593 (its `date` field
    // deliberately disagrees — independent derivation, FIXTURES.md A1)
    val et = Seq(1617171790593L).toDF("ms")
      .select(TimeOps.eventTimeFromMillis(col("ms")).cast("string"))
      .as[String].head()
    assert(et == "2021-03-31 06:23:10")
  }

  test("F4: logday/h/m of the canonical record") {
    val et = TimeOps.eventTimeFromMillis(col("ms"))
    val r = Seq(1617171790593L).toDF("ms")
      .select(TimeOps.logday(et), TimeOps.hourOf(et), TimeOps.minuteOf(et))
      .as[(String, String, String)].head()
    assert(r == ("2021-03-31", "06", "23"))
  }

  test("F5: ISO-date bucket mirrors Kafka2S3Parquet.scala:27-34 edge cases") {
    val cases = Seq(
      "2021-04-13T06:23:10.593Z" -> "20210413",
      "T" -> "error",         // split("T") empty → reference "error" branch
      "TT" -> "error",
      "" -> "",               // reference: split("")(0) = "" → passes through
      "garbage" -> "garbage", // no 'T': prefix passes through, '-' stripped
      "a-bTx" -> "ab")
    val got = cases.map(_._1).toDF("d")
      .select(TimeOps.isoDateBucket(col("d"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
    // documented improvement: null date → "error" (reference would NPE)
    val n = Seq[Option[String]](None).toDF("d")
      .select(TimeOps.isoDateBucket(col("d"))).as[String].head()
    assert(n == "error")
  }

  test("F6: processing-day is computed in UTC+8 (day-boundary fixture)") {
    // 2021-03-31T16:30:00Z = 2021-04-01 00:30 in UTC+8
    val r = Seq("2021-03-31 16:30:00").toDF("s")
      .select(TimeOps.processingDayUtc8(col("s").cast("timestamp")))
      .as[String].head()
    assert(r == "20210401")
  }

  test("property: event-time derivation matches java.time on 500 random epochs") {
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val expected = randomEpochs.map(ms =>
      LocalDateTime.ofEpochSecond(ms / 1000L, 0, ZoneOffset.UTC).format(fmt))
    val got = randomEpochs.toDF("ms")
      .select(TimeOps.eventTimeFromMillis(col("ms")).cast("string"))
      .as[String].collect().toSeq
    assert(got == expected)
  }

  test("property: UTC+8 day matches reference LocalDateTime math on 500 epochs") {
    val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")
    val expected = randomEpochs.map(ms =>
      // Kafka2S3Text.scala:54-58: ofEpochSecond(ms/1000, 0, UTC+8)
      LocalDateTime.ofEpochSecond(ms / 1000L, 0, ZoneOffset.ofHours(8))
        .format(fmt))
    val got = randomEpochs.map(Instant.ofEpochMilli).toDF("t")
      .select(TimeOps.processingDayUtc8(col("t"))).as[String].collect().toSeq
    assert(got == expected)
  }
}
