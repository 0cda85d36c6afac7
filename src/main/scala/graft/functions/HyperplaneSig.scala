package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Signed random-projection LSH signature against a driver-resident
  * hyperplane matrix: bit j of the result is set iff the strict
  * left-to-right sequential dot product of the input vector with
  * plane j is ≥ 0. The wide-signature twin of [[NearestCentroid]]/
  * [[TopCells]]: the literal-column formulation inlines
  * `bits × dim` double constants into the generated projection (a
  * 16-bit signature over 64 dims is 1024 literals — past the method-
  * size limit whole-stage codegen silently degrades, measured 278 s
  * vs 8 s for a 1M-vector index build at bits = 16), while here the
  * planes ride along as ONE reference object and the generated code
  * is a constant-size bits×dim loop at ANY signature width.
  *
  * Bit-identical to the literal path ([[graft.engine.Similarity
  * .lshSignature]]'s small-bits branch) for NON-NULL vectors (all
  * corpora here): same sequential double sums, same ≥ 0 test. Null
  * array, any null element, or a length ≠ the plane width → null —
  * on a null ELEMENT the literal `when` chain would instead emit 0
  * (null test → otherwise branch), the same documented
  * drop-malformed-vs-emit divergence as `nearestCell`. A NaN dot
  * product fails the ≥ 0 test — bit stays 0, same as the literal
  * branch.
  *
  * `planes` is a Seq-of-Seq (value equality) so expression
  * canonicalization and plan caching behave; the primitive matrix is
  * derived lazily once per executor.
  */
case class HyperplaneSig(child: Expression,
    planes: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(planes.nonEmpty, "HyperplaneSig: empty plane set")
  require(planes.forall(_.length == planes.head.length),
    "HyperplaneSig: ragged plane matrix")
  require(planes.length <= 63,
    s"HyperplaneSig: ${planes.length} planes exceed the 63-bit word")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hyperplane_sig"

  private def dim: Int = planes.head.length

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    var sig = 0L
    var j = 0
    while (j < matrix.length) {
      val p = matrix(j)
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += v.getDouble(d) * p(d); d += 1 }
      if (acc >= 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", matrix, "double[][]")
    val childGen = child.genCode(ctx)
    val v = childGen.value
    val ok = ctx.freshName("ok")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val d = ctx.freshName("d")
    val acc = ctx.freshName("acc")
    val p = ctx.freshName("p")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull} && $v.numElements() == $dim) {
          boolean $ok = true;
          for (int $i = 0; $i < $dim && $ok; $i++) {
            if ($v.isNullAt($i)) $ok = false;
          }
          if ($ok) {
            ${ev.isNull} = false;
            for (int $j = 0; $j < ${matrix.length}; $j++) {
              double[] $p = $mat[$j];
              double $acc = 0.0;
              for (int $d = 0; $d < $dim; $d++) {
                $acc += $v.getDouble($d) * $p[$d];
              }
              if ($acc >= 0) ${ev.value} |= 1L << $j;
            }
          }
        }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSig = copy(child = newChild)
}
