package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log via `java.lang.Math.log` — oracle-identical where
  * Spark's builtin is not.
  *
  * Spark's `log()` evaluates through `StrictMath.log` (fdlibm), while
  * the DuckDB oracle's `ln()` matches `java.lang.Math.log` (the
  * platform intrinsic): measured on this host they disagree in the
  * last ulp on 67 of the 4999 integer inputs 2..5000. Any score that
  * feeds ln into a hash-compared double (UCB bonus, Adamic-Adar
  * folds) must therefore route through THIS kernel, not `log()` —
  * with it, ln on integer-valued doubles is bitwise cross-engine
  * (verified 2..5000 this round). Still not a license for ln on
  * arbitrary reals: keep ln inputs integer-valued, where both
  * engines' argument reduction lands identically.
  */
case class JavaLn(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(x: Any): Any =
    java.lang.Math.log(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = java.lang.Math.log($x);")

  override protected def withNewChildInternal(
      newChild: Expression): JavaLn = copy(child = newChild)
}
