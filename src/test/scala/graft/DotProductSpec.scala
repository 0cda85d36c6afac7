package graft

import graft.engine.Similarity
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot equals the higher-order-function formulation bit-exactly") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val pairs = e.as("a").join(e.as("b"),
        col("a.vec_id") < col("b.vec_id") && col("b.vec_id") < 30)
    val r = pairs.select(
        Similarity.dot(col("a.v"), col("b.v")).as("native"),
        Similarity.dotHof(col("a.v"), col("b.v")).as("hof"))
      .as[(Double, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (n, h) => assert(n == h) } // bit-exact, not approx
  }

  test("null semantics: null array, null element, length mismatch → null") {
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (None, Some(Seq(Some(1.0)))),
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (Some(Seq(Some(1.0))), Some(Seq(Some(1.0), Some(2.0)))))
      .toDF("a", "b")
    val r = df.select(Similarity.dot(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0) && r(2).isNullAt(0) && r(3).isNullAt(0))
  }

  test("SQL surface: graft_dot registered in the session") {
    GraftFunctions.register(spark)
    val v = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(v == 11.0)
  }

  test("optimizer rule rewrites the HOF dot-product pattern to graft_dot") {
    graft.engine.Tables.tune(spark) // installs RewriteDotProduct
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val hof = e.select(col("vec_id"),
      Similarity.dotHof(col("v"), col("v")).as("d"))
    // the interpreted aggregate(zip_with(...)) pattern is gone
    val opt = hof.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_dot"), s"rewrite did not fire:\n$opt")
    assert(!opt.contains("aggregate("), s"HOF survived:\n$opt")
    // and results are bit-identical to the explicit native form
    val native = e.select(col("vec_id"),
      Similarity.dot(col("v"), col("v")).as("d"))
    assert(hof.as[(Long, Double)].collect().toSeq ==
      native.as[(Long, Double)].collect().toSeq)
    // a non-matching variant (different zero) is left untouched
    val other = e.select(aggregate(zip_with(col("v"), col("v"),
      (x, y) => x * y), lit(1.0), (acc, x) => acc + x).as("d"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }

  test("whole-stage codegen covers the native dot (no interpreted HOF)") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(Similarity.asDouble(col("embedding")).as("v"))
    val plan = e.select(Similarity.dot(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val dotLine = plan.linesIterator.find(_.contains("graft_dot")).get
    assert(dotLine.trim.startsWith("*"))
    // ...and the stage must COMPILE: fallback disabled so a Janino
    // failure throws instead of silently degrading to interpreted
    val n = strictCodegen {
      e.select(Similarity.dot(col("v"), col("v")).as("d")).count()
    }
    assert(n > 0)
  }
}
