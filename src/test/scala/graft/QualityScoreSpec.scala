package graft

import graft.engine.TextOps
import org.apache.spark.sql.functions._

/** Pins the imperative [[TextOps.qualityScoreOf]] (the memoized
  * quality frame's per-partition pass, r21) bit-identical to the
  * [[TextOps.qualityScore]] Column form the oracle SQL restates —
  * over both fixture corpora and crafted edge rows. Any divergence
  * would silently shift q_quality_calibrated_cut/_sharded's kept set
  * before the oracle hash-check caught it at a coarser granularity.
  */
class QualityScoreSpec extends SparkSpec {
  import spark.implicits._

  private val edgeTexts = Seq(
    "",
    " ",
    "   \t\n  ",
    "a",
    "A.",
    "the and of to in is that a an or",
    "!!!???...,,,;;;:::",
    "word " * 200,
    "the quick brown fox!! 123 ... jumps; over / the lazy dog?",
    "тест кириллица и юникод",
    "中文字符没有空格也没有标点吗？有的。",
    "mixed 中文 and english the of to!",
    "tabs\tand\nnewlinesvertical\ffeed\rreturn",
    "x" * 600,
    "0123456789 " * 60,
    "éàü öß çñ — em-dash and accents",
    "😀 emoji 🎉 beyond the BMP 🚀!")

  private def compare(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df.select(col("text"),
        TextOps.qualityScore(col("text")).as("qc"))
      .as[(String, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, qc) =>
      val qi = TextOps.qualityScoreOf(t)
      assert(java.lang.Double.doubleToRawLongBits(qc)
          == java.lang.Double.doubleToRawLongBits(qi),
        s"column=$qc imperative=$qi for text=${t.take(60)}…")
    }
  }

  test("qualityScoreOf == qualityScore Column bit-exactly on edge rows") {
    compare(edgeTexts.toDF("text"))
  }

  test("qualityScoreOf == qualityScore Column bit-exactly on the fixture corpora") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      compare(graft.engine.Tables(spark, sf, "documents").select("text"))
    }
  }
}
