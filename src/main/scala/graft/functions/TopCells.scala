package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Top-N inner-product argmax against a driver-resident centroid
  * matrix — the IVF coarse-quantizer probe for cell counts beyond what
  * an unrolled literal-array projection can codegen (the vector twin of
  * [[NearestCentroid]], which ranks by squared distance; IVF assignment
  * and probing rank by INNER PRODUCT, so the two expressions share the
  * loop shape but not the metric). Returns the `topN` best cell
  * INDICES, best first; `topN = 1` is corpus-side cell assignment,
  * `topN = nprobe` is the query-side probe.
  *
  * Semantics are bit-identical to the literal struct-array formulation
  * ([[graft.engine.Similarity.qAnnIvf]]'s small-k path): scores are
  * strict left-to-right sequential double dot products; ties break to
  * the LOWEST cell index (strict `>` keeps the earlier cell). Null
  * array, any null element, or a length ≠ the centroid width → null.
  *
  * Selection recomputes the dot products once per emitted slot rather
  * than materializing a k-sized score buffer: per-row cost is
  * O(topN·k·dim) with ZERO per-row allocation beyond the topN-int
  * result — at assignment (`topN = 1`) that is exactly the
  * [[NearestCentroid]] cost profile, and probe-side topN is a small
  * constant over a tiny query set. All-NaN scores (a NaN input
  * element) fill remaining slots with the lowest untaken indices —
  * matching the literal path's sort_array placement of NaN structs —
  * so both paths stay interchangeable row-for-row.
  *
  * `centroids` is a Seq-of-Seq (value equality) so expression
  * canonicalization and plan caching behave; the primitive matrix is
  * derived lazily once per executor.
  */
case class TopCells(child: Expression,
    centroids: Seq[Seq[Double]], topN: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty, "TopCells: empty centroid set")
  require(centroids.forall(_.length == centroids.head.length),
    "TopCells: ragged centroid matrix")
  require(topN >= 1 && topN <= centroids.length,
    s"TopCells: topN=$topN out of range for ${centroids.length} centroids")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top_cells"

  private def dim: Int = centroids.head.length

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    val out = new Array[Int](topN)
    var slot = 0
    while (slot < topN) {
      var best = Double.NegativeInfinity
      var bestCid = -1
      var c = 0
      while (c < matrix.length) {
        var taken = false
        var s = 0
        while (s < slot) { if (out(s) == c) taken = true; s += 1 }
        if (!taken) {
          val cv = matrix(c)
          var acc = 0.0
          var j = 0
          while (j < dim) { acc += v.getDouble(j) * cv(j); j += 1 }
          if (acc > best) { best = acc; bestCid = c }
        }
        c += 1
      }
      if (bestCid < 0) {
        // all remaining scores NaN: fill with lowest untaken index
        var c2 = 0
        while (c2 < matrix.length && bestCid < 0) {
          var taken = false
          var s = 0
          while (s < slot) { if (out(s) == c2) taken = true; s += 1 }
          if (!taken) bestCid = c2
          c2 += 1
        }
      }
      out(slot) = bestCid
      slot += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", matrix, "double[][]")
    val childGen = child.genCode(ctx)
    val v = childGen.value
    val ok = ctx.freshName("ok")
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    val j = ctx.freshName("j")
    val s = ctx.freshName("s")
    val acc = ctx.freshName("acc")
    val best = ctx.freshName("best")
    val bestCid = ctx.freshName("bestCid")
    val cv = ctx.freshName("cv")
    val out = ctx.freshName("out")
    val slot = ctx.freshName("slot")
    val taken = ctx.freshName("taken")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        ArrayData ${ev.value} = null;
        if (!${childGen.isNull} && $v.numElements() == $dim) {
          boolean $ok = true;
          for (int $i = 0; $i < $dim && $ok; $i++) {
            if ($v.isNullAt($i)) $ok = false;
          }
          if ($ok) {
            int[] $out = new int[$topN];
            for (int $slot = 0; $slot < $topN; $slot++) {
              double $best = Double.NEGATIVE_INFINITY;
              int $bestCid = -1;
              for (int $c = 0; $c < ${matrix.length}; $c++) {
                boolean $taken = false;
                for (int $s = 0; $s < $slot; $s++) {
                  if ($out[$s] == $c) $taken = true;
                }
                if (!$taken) {
                  double[] $cv = $cents[$c];
                  double $acc = 0.0;
                  for (int $j = 0; $j < $dim; $j++) {
                    $acc += $v.getDouble($j) * $cv[$j];
                  }
                  if ($acc > $best) { $best = $acc; $bestCid = $c; }
                }
              }
              if ($bestCid < 0) {
                for (int $c = 0; $c < ${matrix.length} && $bestCid < 0; $c++) {
                  boolean $taken = false;
                  for (int $s = 0; $s < $slot; $s++) {
                    if ($out[$s] == $c) $taken = true;
                  }
                  if (!$taken) $bestCid = $c;
                }
              }
              $out[$slot] = $bestCid;
            }
            ${ev.isNull} = false;
            ${ev.value} =
              new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
          }
        }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TopCells = copy(child = newChild)
}
