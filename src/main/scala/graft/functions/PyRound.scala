package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** CPython-parity `round()`: round-half-EVEN applied to the EXACT binary
  * value of the double (CPython's float round is correctly rounded via
  * Gay's dtoa — e.g. round(2.675, 2) == 2.67 because the nearest double to
  * 2.675 is 2.67499…). Spark's `round`/`bround` both go through the
  * shortest decimal repr (BigDecimal.valueOf) and would give 2.68 here, so
  * neither matches; the exact `new BigDecimal(double)` constructor does.
  *
  * `asLong` mirrors the 1-arg form returning int; NaN/±Inf yield null there
  * (CPython raises — null is the engine's error-free analogue).
  * Reference: application.py eval's Python `round` builtin.
  */
case class PyRoundExpr(child: Expression, ndigits: Int, asLong: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = if (asLong) LongType else DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val d = input.asInstanceOf[Double]
    if (d.isNaN || d.isInfinite) {
      if (asLong) null else d
    } else {
      val bd = new java.math.BigDecimal(d)
        .setScale(ndigits, java.math.RoundingMode.HALF_EVEN)
      if (asLong) bd.longValue() else bd.doubleValue()
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PyRoundExpr =
    copy(child = newChild)
}
