package graft

import graft.engine.TextOps

/** Unit checks for text operators whose edge cases the SF oracles
  * can't easily pin (the oracle gate covers the bulk semantics). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition stats: hand-computed fractions and short-doc nulls") {
    val out = TextOps.qRepetitionStats(spark, sf0001)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
    assert(out.nonEmpty)
    // fractions are well-formed wherever defined
    out.foreach { case (_, n, bf, tf) =>
      bf.foreach(f => assert(f > 0.0 && f <= 1.0))
      tf.foreach(f => assert(f >= 0.0 && f <= 1.0))
      assert(bf.isDefined == (n >= 2) && tf.isDefined == (n >= 3))
    }
    // independent recomputation (sliding-window, groupBy — a different
    // formulation than the engine's imperative hash-count loop)
    def stats(text: String): (Long, Option[Double], Option[Double]) = {
      val tk = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      def grams(g: Int) = tk.sliding(g).filter(_.length == g)
        .map(_.mkString(" ")).toSeq
      val bg = grams(2); val tg = grams(3)
      (tk.length.toLong,
        if (bg.isEmpty) None
        else Some(bg.groupBy(identity).values.map(_.size).max.toDouble / bg.size),
        if (tg.isEmpty) None
        else Some(tg.groupBy(identity).values.filter(_.size >= 2)
          .map(_.size).sum.toDouble / tg.size))
    }
    // hand-computed: tokens [a b a b c] → bigrams (a b)×2 (b a) (b c)
    // → top 2/4; trigrams all unique → 0/3
    assert(stats("A  b a B c") == ((5L, Some(0.5), Some(0.0))))
    assert(stats("solo") == ((1L, None, None)))
    assert(stats("") == ((0L, None, None)))
    // and the engine agrees with the independent recomputation on the
    // real corpus
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    out.take(50).foreach { case (id, n, bf, tf) =>
      val (en, ebf, etf) = stats(docs(id))
      assert((n, bf, tf) == ((en, ebf, etf)), s"doc $id")
    }
  }
}
