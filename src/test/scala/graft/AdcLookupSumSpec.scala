package graft

import graft.engine.Similarity
import org.apache.spark.sql.functions._

class AdcLookupSumSpec extends SparkSpec {
  import spark.implicits._

  private def randRows(seed: Int, n: Int): Seq[(Seq[Int], Seq[Seq[Double]])] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val m = 1 + rnd.nextInt(12)
      val ks = 1 + rnd.nextInt(20)
      val codes = Seq.fill(m)(rnd.nextInt(ks))
      val lut = Seq.fill(m)(Seq.fill(ks)(rnd.nextDouble() * 100 - 50))
      (codes, lut)
    }
  }

  test("native ADC equals the higher-order-function twin bit-exactly") {
    // repartition keeps the project physical — over a bare
    // LocalRelation the optimizer constant-folds the expressions
    // driver-side and nothing executes
    val df = randRows(41, 500).toDF("codes", "lut").repartition(2)
    val r = df.select(
        Similarity.adcCol(col("codes"), col("lut")).as("native"),
        Similarity.adcCol(col("codes"), col("lut"), hof = true).as("hof"))
      .as[(Double, Double)].collect()
    assert(r.length == 500)
    r.foreach { case (n, h) => assert(n == h) } // bit-exact
  }

  test("null semantics: null arrays, OOB code, length mismatch → null") {
    val df = Seq(
      // valid: lut[0][1] + lut[1][0] = 2.0 + 3.0
      (Some(Seq(Some(1), Some(0))),
        Some(Seq(Some(Seq(Some(1.0), Some(2.0))),
          Some(Seq(Some(3.0), Some(4.0)))))),
      // null codes array
      (None,
        Some(Seq(Some(Seq(Some(1.0)))))),
      // out-of-bounds code (try_element_at invalid index → null)
      (Some(Seq(Some(5))),
        Some(Seq(Some(Seq(Some(1.0), Some(2.0)))))),
      // element null inside codes
      (Some(Seq(None: Option[Int])),
        Some(Seq(Some(Seq(Some(1.0)))))),
      // length mismatch (zip_with's null padding nulls the sum)
      (Some(Seq(Some(0), Some(0))),
        Some(Seq(Some(Seq(Some(1.0)))))),
      // null subspace table
      (Some(Seq(Some(0))), Some(Seq(None: Option[Seq[Option[Double]]]))))
      .zipWithIndex.map { case ((c, l), i) => (i, c, l) }
      .toDF("i", "codes", "lut")
      .repartition(2) // keep the project physical (LocalRelation folds)
    val native = df.select(col("i"),
        Similarity.adcCol(col("codes"), col("lut")).as("v"))
      .collect().map(r => r.getInt(0) -> r).sortBy(_._1).map(_._2)
    val hof = df.select(col("i"),
        Similarity.adcCol(col("codes"), col("lut"), hof = true).as("v"))
      .collect().map(r => r.getInt(0) -> r).sortBy(_._1).map(_._2)
    assert(native(0).getDouble(1) == 5.0 && hof(0).getDouble(1) == 5.0)
    (1 to 5).foreach { i =>
      assert(native(i).isNullAt(1), s"native row $i")
      assert(hof(i).isNullAt(1), s"hof row $i")
    }
    // negative code: native nulls; the HOF twin cannot express it
    // (index 0 is a hard error even for try_element_at) — codes are
    // argmin outputs in [0, ks), so the case is native-only defense
    val neg = Seq((Seq(-1), Seq(Seq(1.0)))).toDF("codes", "lut")
      .repartition(2)
      .select(Similarity.adcCol(col("codes"), col("lut"))).collect()
    assert(neg(0).isNullAt(0))
  }

  test("SQL surface: graft_adc registered in the session") {
    graft.functions.GraftFunctions.register(spark)
    val v = spark.sql(
      "SELECT graft_adc(array(1, 0), " +
        "array(array(1.0d, 2.0d), array(3.0d, 4.0d))) AS d")
      .as[Double].head()
    assert(v == 5.0)
  }

  test("whole-stage codegen covers the native ADC") {
    // range-derived input: stays a physical scan (never a folded
    // LocalRelation), so the generated stage is inspectable
    val lut = Seq.tabulate(8)(j => Seq.tabulate(16)(k => j * 16.0 + k))
    val df = spark.range(50).select(
      array((0 until 8).map(j =>
        pmod(col("id") + j, lit(16)).cast("int")): _*).as("codes"),
      typedLit(lut).as("lut"))
    val plan = df
      .select(Similarity.adcCol(col("codes"), col("lut")).as("adc"))
      .queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_adc")).get
    assert(line.trim.startsWith("*"), plan) // inside WholeStageCodegen
    // ... and the generated stage actually COMPILES: with fallback
    // disabled a Janino failure throws instead of degrading to
    // interpreted (the exact failure mode of the r15 margin-strip bug)
    val vals = strictCodegen {
      df.select(Similarity.adcCol(col("codes"), col("lut")).as("adc"))
        .as[Double].collect()
    }
    assert(vals.length == 50)
  }
}
