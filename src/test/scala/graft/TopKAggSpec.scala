package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAgg: bounded-buffer top-k equals the window formulation") {
    val agg = Relationalish.windowTop3(spark, sf0001)
    val got = graft.engine.Relational.qTopKGrouped(spark, sf0001)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(got == agg)
    assert(got.nonEmpty)
  }

  test("TopKAgg: result is partitioning-independent and tie-stable") {
    val in = Seq(
      ("a", 5.0, 3L), ("a", 5.0, 1L), ("a", 5.0, 2L), ("a", 4.0, 9L),
      ("b", 1.0, 1L))
    // same rows, three different physical layouts
    val layouts = Seq(
      in.toDF("k", "score", "id"),
      in.reverse.toDF("k", "score", "id").repartition(7),
      in.toDF("k", "score", "id").repartition(1))
    val results = layouts.map { df =>
      df.as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(new TopKAgg(3).toColumn.name("top"))
        .collect().toMap
    }
    assert(results.forall(_ == results.head))
    // ties on score keep the LOWEST ids, in order
    assert(results.head("a") == Seq((5.0, 1L), (5.0, 2L), (5.0, 3L)))
  }

  test("TopKAgg: merge is order-insensitive for random partitionings") {
    // driver-level property: fold the same multiset through random
    // partition splits/orders; every path must agree with sort-take
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(30)
      val xs = Seq.fill(n)((rnd.nextInt(5).toDouble, rnd.nextInt(8).toLong))
      val k = 1 + rnd.nextInt(4)
      val agg = new TopKAgg(k)
      val expected = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      val nParts = 1 + rnd.nextInt(4)
      val parts = rnd.shuffle(xs).grouped(
        math.max(1, (xs.size + nParts - 1) / nParts)).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == expected,
        s"xs=$xs k=$k parts=$parts")
      // distinct mode: bit-identical duplicate pairs collapse (the
      // multi-table LSH candidate stream), same total order — the
      // small value domains above make duplicate pairs the common
      // case, and the property must hold on every partitioning
      val dAgg = new TopKAgg(k, distinct = true)
      val dExpected = xs.distinct.sortBy { case (s, id) => (-s, id) }.take(k)
      val dMerged = parts
        .map(p => p.foldLeft(dAgg.zero)(dAgg.reduce))
        .foldLeft(dAgg.zero)(dAgg.merge)
      assert(dAgg.finish(dMerged) == dExpected,
        s"distinct xs=$xs k=$k parts=$parts")
    }
  }

  test("TopKAgg: NaN scores keep a total order on every partitioning") {
    // NaN compares false to everything under IEEE >/==, so a naive
    // `better` loses associativity the moment a NaN score (cosine of
    // a zero-norm vector) enters the stream — insertion position
    // then depends on arrival order (ADVICE r10). The aggregator
    // orders via java.lang.Double.compare (NaN greatest, matching
    // the Window formulation's Spark sort it replaced); reference
    // ordering here is the same NaN-total comparator.
    val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // score DESC
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val rnd = new scala.util.Random(11)
    def score(): Double = rnd.nextInt(6) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case _ => rnd.nextInt(4).toDouble
    }
    // Canonical pair identity for both the reference dedup and the
    // assertion: doubleToLongBits collapses every NaN to one bit
    // pattern, so (NaN, id) equals (NaN, id) — Scala tuple `==`
    // keeps IEEE NaN semantics (non-reflexive), which would both
    // leave phantom duplicates in the reference's `distinct` AND
    // fail the assertion on a correct NaN-topped result.
    def canon(x: (Double, Long)): (Long, Long) =
      (java.lang.Double.doubleToLongBits(x._1), x._2)
    (1 to 200).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(30))((score(), rnd.nextInt(8).toLong))
      val k = 1 + rnd.nextInt(4)
      val nParts = 1 + rnd.nextInt(4)
      val parts = rnd.shuffle(xs).grouped(
        math.max(1, (xs.size + nParts - 1) / nParts)).toSeq
      Seq(false, true).foreach { distinct =>
        val agg = new TopKAgg(k, distinct)
        val base = if (distinct) xs.distinctBy(canon) else xs
        val expected = base.sorted(ord).take(k)
        val merged = parts
          .map(p => p.foldLeft(agg.zero)(agg.reduce))
          .foldLeft(agg.zero)(agg.merge)
        assert(agg.finish(merged).map(canon) == expected.map(canon),
          s"distinct=$distinct got=${agg.finish(merged)} " +
            s"want=$expected xs=$xs k=$k parts=$parts")
      }
    }
  }
}

/** Window-formulation reference used by the equality test. */
private object Relationalish {
  def windowTop3(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Seq[(String, Long, Double, Long)] = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    graft.engine.Tables(spark, sfDir, "orders")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("o_orderpriority"), col("rank"), col("o_totalprice"),
        col("o_orderkey"))
      .orderBy(col("o_orderpriority"), col("rank"))
      .as[(String, Long, Double, Long)].collect().toSeq
  }
}
