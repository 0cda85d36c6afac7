package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Squared-distance argmin against a driver-resident centroid matrix —
  * the broadcast-centroid assignment path for k-means / SemDeDup cell
  * counts beyond what an unrolled literal-array projection can codegen
  * (each literal centroid inlines dim constants into the generated
  * method; past a few dozen centroids that blows the JVM's 64 KB
  * method limit and codegen falls back to interpretation). Here the
  * matrix rides along as ONE reference object and the generated code
  * is a constant-size k×dim loop — method size independent of k, so
  * 30k cells codegen as cheaply as 8.
  *
  * Semantics are bit-identical to the literal-projection formulation
  * ([[graft.engine.Similarity.nearestCell]]): per cell,
  * d2 = (Σᵢ vᵢ·cᵢ strictly left-to-right) · (−2) + |c|², where |c|² is
  * precomputed driver-side as the strict sequential sum of squares;
  * ties break to the lowest cell id (strict `<` keeps the earlier
  * cell). Null array, any null element, or a length ≠ the centroid
  * width → null. Like the per-row scan it replaces, cost is O(k·dim)
  * per row with zero shuffle — the corpus never moves for assignment.
  *
  * `centroids` is a Seq-of-Seq (value equality) so expression
  * canonicalization and plan caching behave; the primitive matrix and
  * the |c|² vector are derived lazily once per executor.
  */
case class NearestCentroid(child: Expression,
    centroids: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty, "NearestCentroid: empty centroid set")
  require(centroids.forall(_.length == centroids.head.length),
    "NearestCentroid: ragged centroid matrix")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  private def dim: Int = centroids.head.length

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  // strict sequential sum of squares — matches cv.map(x => x*x).sum
  // in the literal path, so both paths produce the same double
  @transient private lazy val normsSq: Array[Double] =
    matrix.map { cv =>
      var s = 0.0; var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      s
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    var best = Double.PositiveInfinity
    var bestCid = -1
    var c = 0
    while (c < matrix.length) {
      val cv = matrix(c)
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += v.getDouble(j) * cv(j); j += 1 }
      val d2 = acc * -2.0 + normsSq(c)
      if (d2 < best) { best = d2; bestCid = c }
      c += 1
    }
    // all-NaN distances (a NaN input element) leave bestCid untouched;
    // the literal path's array_min orders NaN equal-largest and
    // tie-breaks to cell 0 — match it, never emit a phantom cell
    if (bestCid < 0) 0 else bestCid
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", matrix, "double[][]")
    val c2s = ctx.addReferenceObj("normsSq", normsSq, "double[]")
    val childGen = child.genCode(ctx)
    val v = childGen.value
    val ok = ctx.freshName("ok")
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    val j = ctx.freshName("j")
    val acc = ctx.freshName("acc")
    val d2 = ctx.freshName("d2")
    val best = ctx.freshName("best")
    val bestCid = ctx.freshName("bestCid")
    val cv = ctx.freshName("cv")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = -1;
        if (!${childGen.isNull} && $v.numElements() == $dim) {
          boolean $ok = true;
          for (int $i = 0; $i < $dim && $ok; $i++) {
            if ($v.isNullAt($i)) $ok = false;
          }
          if ($ok) {
            double $best = Double.POSITIVE_INFINITY;
            int $bestCid = -1;
            for (int $c = 0; $c < ${matrix.length}; $c++) {
              double[] $cv = $cents[$c];
              double $acc = 0.0;
              for (int $j = 0; $j < $dim; $j++) {
                $acc += $v.getDouble($j) * $cv[$j];
              }
              double $d2 = $acc * -2.0 + $c2s[$c];
              if ($d2 < $best) { $best = $d2; $bestCid = $c; }
            }
            ${ev.isNull} = false;
            ${ev.value} = $bestCid < 0 ? 0 : $bestCid;
          }
        }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
}
