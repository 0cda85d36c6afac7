package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd PQ asymmetric-distance lookup-sum:
  * (codes: array<int>, lut: array<array<double>>) →
  * Σ_j lut[j][codes[j]] — the per-candidate hot loop of the IVF-PQ
  * probe ([[graft.engine.Similarity.qAnnPq]]). The HOF formulation
  * `aggregate(zip_with(lut, codes, (l, c) => element_at(l, c + 1)),
  * 0d, _ + _)` is interpreted (higher-order functions have no
  * codegen) and allocates a zipped array per candidate row; at scale
  * the ADC sum runs once per (query, candidate) over the whole
  * probed posting list, which makes it exactly the kind of site the
  * [[DotProduct]] precedent earned its expression for.
  *
  * Semantics are identical to the HOF formulation FOR CODES ≥ −1
  * (the entire PQ domain — codes are unsigned byte indices): strict
  * left-to-right double summation, null if either array is null,
  * lengths differ (zip_with's null padding nulls the sum), any
  * element is null, or a code indexes outside its subspace table
  * (element_at's invalid-index null). For codes ≤ −2 the two
  * diverge by design: `try_element_at` resolves negative indices
  * from the array END (non-null sum) while this expression nulls —
  * out-of-domain garbage should read as "no distance", never as a
  * silently wrong lookup. `AdcLookupSumSpec` pins the equivalence
  * on randomized in-domain inputs across both codegen paths and
  * documents the negative-code divergence. */
case class AdcLookupSum(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // inferred Seq[ArrayType] <: Seq[AbstractDataType] (the parent type
  // is private[sql] and cannot be named here)
  override def inputTypes =
    Seq(ArrayType(IntegerType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (n != lut.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      var bad = false
      while (i < n && !bad) {
        if (codes.isNullAt(i) || lut.isNullAt(i)) bad = true
        else {
          val c = codes.getInt(i)
          val sub = lut.getArray(i)
          if (c < 0 || c >= sub.numElements() || sub.isNullAt(c)) bad = true
          else { acc += sub.getDouble(c); i += 1 }
        }
      }
      if (bad) null else acc
    }
  }

  // CAUTION: no generated line may START with '|' — Block.toString
  // strips margin characters from code"" templates, so a line-leading
  // "||" silently becomes invalid Java (Janino parse failure →
  // whole-stage fallback to interpreted). Keep boolean operators at
  // end-of-line.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val c = ctx.freshName("c")
    val sub = ctx.freshName("sub")
    val acc = ctx.freshName("acc")
    val bad = ctx.freshName("bad")
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${l.isNull} && !${r.isNull}
            && ${l.value}.numElements() == ${r.value}.numElements()) {
          int $n = ${l.value}.numElements();
          double $acc = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n && !$bad; $i++) {
            if (${l.value}.isNullAt($i) || ${r.value}.isNullAt($i)) {
              $bad = true;
            } else {
              int $c = ${l.value}.getInt($i);
              org.apache.spark.sql.catalyst.util.ArrayData $sub =
                ${r.value}.getArray($i);
              if ($c < 0 || $c >= $sub.numElements() ||
                  $sub.isNullAt($c)) {
                $bad = true;
              } else {
                $acc += $sub.getDouble($c);
              }
            }
          }
          if (!$bad) { ${ev.isNull} = false; ${ev.value} = $acc; }
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}
