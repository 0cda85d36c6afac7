package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns —
  * the one place profiling justified a custom Catalyst `Expression`
  * (SURVEY §7.4): the built-in formulation
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` is interpreted
  * (higher-order functions have no codegen) and allocates a zipped
  * array per row, which dominates the embedding similarity scans.
  *
  * Semantics are identical to the built-in formulation — strict
  * left-to-right double summation (bit-exact vs DuckDB's
  * `list_inner_product` on DOUBLE[]), null if either array is null,
  * any element is null, or lengths differ (zip_with pads the shorter
  * side with null, nulling the sum).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // inferred Seq[ArrayType] <: Seq[AbstractDataType] (the parent type
  // is private[sql] and cannot be named here)
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      var anyNull = false
      while (i < n && !anyNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) anyNull = true
        else { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      }
      if (anyNull) null else acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val anyNull = ctx.freshName("anyNull")
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
          boolean $anyNull = false;
          for (int $i = 0; $i < $n && !$anyNull; $i++) {
            if (${l.value}.isNullAt($i) || ${r.value}.isNullAt($i)) {
              $anyNull = true;
            } else {
              $acc += ${l.value}.getDouble($i) * ${r.value}.getDouble($i);
            }
          }
          if (!$anyNull) { ${ev.isNull} = false; ${ev.value} = $acc; }
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Runtime + config-time registration of graft's native functions. */
object GraftFunctions {
  val dotBuilder: Seq[Expression] => Expression = es => DotProduct(es(0), es(1))
  val adcBuilder: Seq[Expression] => Expression =
    es => AdcLookupSum(es(0), es(1))
  val jwBuilder: Seq[Expression] => Expression =
    es => JaroWinkler(es(0), es(1))
  val fixlog2Builder: Seq[Expression] => Expression =
    es => FixLog2Expr(es(0), es(1))

  /** Register into an existing session's function registry (used by
    * Tables.tune so `graft_dot` / `graft_adc` / `graft_jw` are
    * callable from SQL everywhere). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_adc", adcBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jw", jwBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fixlog2", fixlog2Builder, "built-in")
  }
}

/** `SparkSessionExtensions` entry point — the deployment-time path:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * injects `graft_dot`/`graft_adc` and the HOF→native dot-product
  * optimizer rule into every session of the cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      GraftFunctions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_adc"),
      new ExpressionInfo(classOf[AdcLookupSum].getName, "graft_adc"),
      GraftFunctions.adcBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_jw"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jw"),
      GraftFunctions.jwBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_fixlog2"),
      new ExpressionInfo(classOf[FixLog2Expr].getName, "graft_fixlog2"),
      GraftFunctions.fixlog2Builder))
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
  }
}
