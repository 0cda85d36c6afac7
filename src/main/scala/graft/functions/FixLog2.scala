package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact fixed-point base-2 logarithm — the engine's no-libm `log`.
  *
  * Cross-engine hash-exactness bans `ln`/`log` everywhere (libm is
  * not correctly rounded and Java's and DuckDB's last ulps disagree),
  * which is why entropy-shaped scores so far shipped as proxies
  * (Gini–Simpson for diversity, probability sums for the bigram LM).
  * This primitive removes the restriction: `floor`-deterministic
  * integer square-and-shift (the classical binary-logarithm
  * algorithm) computes `L ≈ 2¹⁶·log2(num/den)` using ONLY integer
  * shifts, multiplies and floor division — every step is
  * bit-identical in Spark and DuckDB, so downstream sums of L are
  * hash-exact, while |L/2¹⁶ − log2(n/d)| ≤ 2·10⁻⁵ bits (measured
  * over 5·10⁵ random 61-bit inputs; spec asserts 10⁻⁴).
  *
  * Algorithm (num = n ≥ 1, den = d ≥ 1, both < 2⁶²):
  *  1. prenorm: s = max(0, bitlen(d) − 36); d₂ = d >> s (rel. error
  *     ≤ 2⁻³⁵; the −s rejoins in step 5) so the divisor stays < 2³⁶;
  *  2. x = (n << (62 − bitlen(n))) / d₂ — the ratio carried at full
  *     63-bit precision, x ∈ (2²⁵, 2⁶²);
  *  3. mantissa m = x >> (p − 24) ∈ [2²⁴, 2²⁵), p = bitlen(x) − 1;
  *  4. 16 × square-and-shift: m ← m²>>24, emit bit [m ≥ 2²⁵] — each
  *     iteration extracts the next fractional bit of log2(m/2²⁴)
  *     (m² < 2⁵⁰, no overflow);
  *  5. L = (p + bitlen(n) − 62 − s)·2¹⁶ + fraction-bits.
  *
  * bitlen is `length(conv(v, 10, 2))` (Spark) / `length(bin(v))`
  * (DuckDB) — binary-string length, no floating point anywhere.
  * Everything composes from built-in codegen'd expressions (variable
  * shifts via SQL `shiftleft`/`shiftright`, whose shift operand is a
  * full expression even though the Scala DSL only takes literals),
  * so the whole derivation stays inside whole-stage codegen; the
  * intended call sites are small aggregated tables (vocab- or
  * mix-sized), never the raw corpus scan.
  */
object FixLog2 {

  /** Fraction bits of the result scale (L is in units of 2⁻¹⁶ bits). */
  val Scale = 65536L

  private val prefix = "__fl"

  /** Append integer column `out` = fixed-point log2(num/den) (scaled
    * by [[Scale]]) to `df`. Both inputs must be ≥ 1 and < 2⁶²
    * (callers pass add-one-smoothed counts, so ≥ 1 holds by
    * construction).
    *
    * Since r21 this is ONE native codegen'd expression
    * ([[FixLog2Expr]], Java-semantics twin of [[ref]]) instead of the
    * ~50-Project Column ladder [[withFixLog2Columns]]: the ladder's
    * value was correct, but every optimizer pass — and, with AQE, the
    * RE-optimization after every query stage — walked its 50 chained
    * Projects, and plans stacking several ladders (q_psi, q_benford,
    * the entropy family) measured ~1 s of pure driver latency per
    * execution against ~0.2 s of actual stage work. Bit-equality of
    * the three engines (native == ladder == driver ref) is pinned by
    * FixLog2Spec; the DuckDB oracle keeps restating the ladder as
    * CTEs, so every consuming query's hash-check re-proves the
    * cross-engine contract. */
  def withFixLog2(df: DataFrame, num: Column, den: Column,
      out: String): DataFrame =
    df.withColumn(out, org.apache.spark.sql.GraftBridge.column(
      FixLog2Expr(
        org.apache.spark.sql.GraftBridge.expression(num.cast("long")),
        org.apache.spark.sql.GraftBridge.expression(den.cast("long")))))

  /** The original built-in-expression formulation, kept as the spec's
    * fourth engine (FixLog2Spec asserts it stays bit-identical to the
    * native [[FixLog2Expr]] — the same chain the DuckDB oracle CTEs
    * restate). Internal columns are `__fl_*`-prefixed and dropped.
    * Each step binds an attribute (withColumn), so the plan stays
    * linear in the 16 iterations instead of exponentiating the
    * tree — but 50 chained Projects still tax every optimizer pass,
    * which is why query code calls [[withFixLog2]] instead. */
  private[graft] def withFixLog2Columns(df: DataFrame, num: Column,
      den: Column, out: String): DataFrame = {
    val P = prefix
    var d = df
      .withColumn(s"${P}_n", num.cast("long"))
      .withColumn(s"${P}_d0", den.cast("long"))
      .withColumn(s"${P}_s",
        greatest(lit(0), length(conv(col(s"${P}_d0"), 10, 2)) - lit(36)))
      .withColumn(s"${P}_d", expr(s"shiftright(${P}_d0, ${P}_s)"))
      .withColumn(s"${P}_sa", length(conv(col(s"${P}_n"), 10, 2)))
      .withColumn(s"${P}_x",
        expr(s"shiftleft(${P}_n, 62 - ${P}_sa) div ${P}_d"))
      .withColumn(s"${P}_p", length(conv(col(s"${P}_x"), 10, 2)) - lit(1))
      .withColumn(s"${P}_m", expr(s"shiftright(${P}_x, ${P}_p - 24)"))
      .withColumn(s"${P}_r", lit(0L))
    for (_ <- 1 to 16) {
      d = d
        .withColumn(s"${P}_q", expr(s"shiftright(${P}_m * ${P}_m, 24)"))
        .withColumn(s"${P}_m",
          when(col(s"${P}_q") >= lit(1L << 25),
            expr(s"shiftright(${P}_q, 1)")).otherwise(col(s"${P}_q")))
        .withColumn(s"${P}_r", col(s"${P}_r") * lit(2L) +
          when(col(s"${P}_q") >= lit(1L << 25), lit(1L)).otherwise(lit(0L)))
    }
    d.withColumn(out,
        (col(s"${P}_p") + col(s"${P}_sa") - lit(62) - col(s"${P}_s"))
          .cast("long") * lit(Scale) + col(s"${P}_r"))
      .drop(d.columns.filter(_.startsWith(P)).toIndexedSeq: _*)
  }

  /** Binary-string bit length exactly as the ladder computes it:
    * `length(conv(v, 10, 2))` — 1 for v = 0 ("0"), 64 for negatives
    * (two's-complement digits), 64 − nlz otherwise. */
  @inline private def bitlen(v: Long): Int =
    if (v == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** The hot-path core [[FixLog2Expr]] evaluates per row — the exact
    * Java-semantics replay of the Column ladder (shifts mask the
    * count to 6 bits like SQL shiftleft/shiftright; `div` on the
    * non-negative operands here is plain Java division; bitlen via
    * [[bitlen]]). Total for every (n, d) with d ≠ 0 — the d = 0
    * ladder output was NULL (IntegralDivide), which [[FixLog2Expr]]
    * reproduces by guarding before the call. */
  def compute(n: Long, d: Long): Long = {
    val s = math.max(0, bitlen(d) - 36)
    val d2 = d >> s
    val sa = bitlen(n)
    val x = (n << (62 - sa)) / d2
    val p = bitlen(x) - 1
    var m = x >> (p - 24)
    var r = 0L
    var i = 0
    while (i < 16) {
      val q = (m * m) >> 24
      if (q >= (1L << 25)) { m = q >> 1; r = r * 2 + 1 }
      else { m = q; r = r * 2 }
      i += 1
    }
    (p + sa - 62 - s).toLong * Scale + r
  }

  /** Driver-side reference twin of [[withFixLog2]] — the spec's
    * third engine (engine == oracle == this, all bit-identical). */
  def ref(n: Long, d: Long): Long = {
    require(n >= 1 && d >= 1, s"fixlog2 inputs must be >= 1: $n/$d")
    val s = math.max(0, java.lang.Long.toBinaryString(d).length - 36)
    val d2 = d >> s
    val sa = java.lang.Long.toBinaryString(n).length
    val x = (n << (62 - sa)) / d2
    val p = java.lang.Long.toBinaryString(x).length - 1
    var m = x >> (p - 24)
    var r = 0L
    for (_ <- 1 to 16) {
      val q = (m * m) >> 24
      if (q >= (1L << 25)) { m = q >> 1; r = r * 2 + 1 }
      else { m = q; r = r * 2 }
    }
    (p + sa - 62 - s).toLong * Scale + r
  }

  /** DuckDB twin as a chain of CTE definitions: returns the CTE text
    * (to splice after a leading `WITH existing AS (...),`) and the
    * name of the final CTE, which exposes every column of `src` plus
    * `<tag>_out` = the fixed-point log2 of numExpr/denExpr. `tag`
    * keeps multiple chains in one statement collision-free.
    */
  def ctesSql(tag: String, src: String, numExpr: String,
      denExpr: String): (String, String) = {
    val P = tag
    val sb = new StringBuilder
    sb.append(s"${P}0 AS (SELECT *, CAST($numExpr AS BIGINT) AS ${P}_n, " +
      s"CAST($denExpr AS BIGINT) AS ${P}_d0 FROM $src),\n")
    sb.append(s"${P}1 AS (SELECT *, GREATEST(0, length(bin(${P}_d0)) - 36) " +
      s"AS ${P}_s FROM ${P}0),\n")
    sb.append(s"${P}2 AS (SELECT *, (${P}_d0 >> ${P}_s) AS ${P}_d, " +
      s"length(bin(${P}_n)) AS ${P}_sa FROM ${P}1),\n")
    sb.append(s"${P}3 AS (SELECT *, ((${P}_n << (62 - ${P}_sa)) // ${P}_d) " +
      s"AS ${P}_x FROM ${P}2),\n")
    sb.append(s"${P}4 AS (SELECT *, (length(bin(${P}_x)) - 1) AS ${P}_p " +
      s"FROM ${P}3),\n")
    sb.append(s"${P}5 AS (SELECT *, (${P}_x >> (${P}_p - 24)) AS ${P}_m0, " +
      s"CAST(0 AS BIGINT) AS ${P}_r0 FROM ${P}4),\n")
    var prev = s"${P}5"
    for (i <- 1 to 16) {
      sb.append(s"${P}q$i AS (SELECT *, ((${P}_m${i - 1} * ${P}_m${i - 1}) " +
        s">> 24) AS ${P}_t$i FROM $prev),\n")
      sb.append(s"${P}s$i AS (SELECT *, CASE WHEN ${P}_t$i >= 33554432 " +
        s"THEN (${P}_t$i >> 1) ELSE ${P}_t$i END AS ${P}_m$i, " +
        s"${P}_r${i - 1} * 2 + (CASE WHEN ${P}_t$i >= 33554432 THEN 1 " +
        s"ELSE 0 END) AS ${P}_r$i FROM ${P}q$i),\n")
      prev = s"${P}s$i"
    }
    sb.append(s"${P}z AS (SELECT *, (CAST(${P}_p + ${P}_sa - 62 - ${P}_s " +
      s"AS BIGINT) * $Scale + ${P}_r16) AS ${P}_out FROM $prev)")
    (sb.toString, s"${P}z")
  }
}

/** Native codegen'd fixed-point log2 — ONE expression node carrying
  * the whole [[FixLog2.withFixLog2Columns]] ladder (r21). The ladder's
  * ~50 chained Projects were correct but taxed every optimizer and
  * AQE re-optimization pass; plans stacking several ladders measured
  * ~1 s of driver latency per execution. Value semantics are the
  * ladder's exactly: null-propagating on null inputs, NULL for den = 0
  * (the ladder's IntegralDivide), [[FixLog2.compute]] — the Java
  * replay of the same shift/multiply/floor-divide chain — everywhere
  * else. FixLog2Spec pins native == ladder == driver ref; the DuckDB
  * oracle restates the ladder as CTEs, so every consuming query's
  * hash-check re-proves the cross-engine contract. */
case class FixLog2Expr(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, LongType}

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fixlog2"

  override def nullSafeEval(n: Any, d: Any): Any = {
    val dv = d.asInstanceOf[Long]
    if (dv == 0L) null
    else FixLog2.compute(n.asInstanceOf[Long], dv)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, d) => {
      s"""
        if ($d == 0L) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.functions.FixLog2.compute($n, $d);
        }"""
    })

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression)
      : FixLog2Expr = copy(left = newLeft, right = newRight)
}
