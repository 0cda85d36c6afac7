package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    GraftBridge.column(graft.functions.JaroWinkler(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  // expected values are DuckDB jaro_winkler_similarity outputs,
  // captured verbatim (full double repr) — the variant contract
  private val pinned = Seq(
    ("martha", "marhta", 0.9611111111111111), // transposition + boost
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("dwayne", "duane", 0.8400000000000001),
    // the fixture shape: shared 17-char prefix, capped 4-char boost
    ("Customer#000000001", "Customer#000000002", 0.9777777777777777),
    ("abc", "abc", 1.0),
    ("a", "b", 0.0),
    ("ab", "ba", 0.0), // window 0: transposed pair has NO matches
    ("", "x", 0.0),
    ("", "", 0.0)) // DuckDB's one departure from the textbook 1.0

  test("pinned DuckDB values, interpreted path") {
    pinned.foreach { case (a, b, exp) =>
      val got = graft.functions.JaroWinklerImpl.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == exp, s"jw($a, $b)") // bit-exact
    }
  }

  test("pinned DuckDB values through codegen, compile enforced") {
    val df = pinned.toDF("a", "b", "exp").repartition(2)
    val rows = strictCodegen {
      df.select(jw(col("a"), col("b")).as("got"), col("exp"))
        .as[(Double, Double)].collect()
    }
    rows.foreach { case (got, exp) => assert(got == exp) }
  }

  test("null semantics: either side null -> null") {
    val df = Seq((0, Some("ab"), None: Option[String]),
        (1, None: Option[String], Some("ab")),
        (2, Some("ab"), Some("ab")))
      .toDF("i", "a", "b").repartition(2)
    // repartition reorders; re-sort by the index before asserting
    val r = df.select(col("i"), jw(col("a"), col("b")))
      .collect().sortBy(_.getInt(0))
    assert(r(0).isNullAt(1) && r(1).isNullAt(1))
    assert(r(2).getDouble(1) == 1.0)
  }

  test("SQL surface: graft_jw registered") {
    graft.functions.GraftFunctions.register(spark)
    val v = spark.sql("SELECT graft_jw('martha', 'marhta') AS j")
      .as[Double].head()
    assert(v == 0.9611111111111111)
  }

  test("symmetry and range over randomized fixture-like keys") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.fill(400) {
      def k() = "Customer#" + Seq.fill(9)(rnd.nextInt(10)).mkString
      def corrupt(s: String) = {
        val i = rnd.nextInt(s.length)
        s.updated(i, ('a' + rnd.nextInt(26)).toChar)
      }
      val a = k(); (a, if (rnd.nextBoolean()) corrupt(a) else k())
    }
    val df = rows.toDF("a", "b").repartition(4)
    val r = df.select(jw(col("a"), col("b")).as("ab"),
        jw(col("b"), col("a")).as("ba"))
      .as[(Double, Double)].collect()
    r.foreach { case (ab, ba) =>
      assert(ab == ba) // match window is symmetric in max(len)
      assert(ab >= 0.0 && ab <= 1.0)
    }
  }
}
