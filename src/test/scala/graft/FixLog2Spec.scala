package graft

import graft.functions.FixLog2
import org.apache.spark.sql.functions._

class FixLog2Spec extends SparkSpec {
  import spark.implicits._

  private def cases: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    val random = Seq.fill(2000) {
      val n = 1L + (rnd.nextLong().abs % (1L << rnd.nextInt(61)))
      val d = 1L + (rnd.nextLong().abs % (1L << rnd.nextInt(61)))
      (n, d)
    }
    val edges = for {
      n <- Seq(1L, 2L, 3L, (1L << 24) - 1, 1L << 24, (1L << 36) + 1,
        (1L << 61) - 1)
      d <- Seq(1L, 2L, 3L, (1L << 35) - 1, 1L << 36, (1L << 36) + 1,
        (1L << 61) - 1)
    } yield (n, d)
    random ++ edges
  }

  test("fixlog2: engine == driver reference bit-exactly; accurate to 1e-4 bits") {
    val df = cases.toDF("n", "d")
    val out = strictCodegen {
      FixLog2.withFixLog2(df, col("n"), col("d"), "l")
        .select("n", "d", "l").as[(Long, Long, Long)].collect()
    }
    assert(out.length == cases.length)
    out.foreach { case (n, d, l) =>
      assert(l == FixLog2.ref(n, d), s"engine != ref for $n/$d")
      val err = math.abs(l.toDouble / FixLog2.Scale -
        math.log(n.toDouble / d.toDouble) / math.log(2.0))
      assert(err <= 1e-4, s"accuracy $err for $n/$d")
    }
  }

  test("fixlog2: native expression == the Column ladder (the oracle CTEs' engine twin)") {
    // r21 replaced the ~50-Project ladder with one native codegen'd
    // expression in query code; the ladder stays as the engine twin of
    // the DuckDB CTE chain, and this test pins the two bit-identical
    // so the native path can never drift from what the oracle states.
    val df = cases.toDF("n", "d")
    val native = FixLog2.withFixLog2(df, col("n"), col("d"), "l")
      .select("n", "d", "l").as[(Long, Long, Long)].collect().sorted
    val ladder = FixLog2.withFixLog2Columns(df, col("n"), col("d"), "l")
      .select("n", "d", "l").as[(Long, Long, Long)].collect().sorted
    assert(native.length == ladder.length)
    native.zip(ladder).foreach { case (nv, lv) =>
      assert(nv == lv, s"native $nv != ladder $lv")
    }
  }

  test("fixlog2: DuckDB CTE chain is generated with matching constants") {
    // The oracle twin runs only driver-side (python duckdb); here we
    // pin the generated SQL's shape so a constant drift (scale,
    // mantissa width, iteration count) cannot ship silently.
    val (ctes, last) = FixLog2.ctesSql("fx", "base", "num", "den")
    assert(last == "fxz")
    assert(ctes.contains("- 36)"))          // prenorm divisor bound
    assert(ctes.contains(">> 24)"))         // mantissa width
    assert(ctes.contains("fx_m16"))         // 16 iterations
    assert(!ctes.contains("fx_m17"))
    assert(ctes.contains(s"* ${FixLog2.Scale} + fx_r16"))
    assert(ctes.contains("33554432"))       // 2^25 renorm threshold
  }
}
