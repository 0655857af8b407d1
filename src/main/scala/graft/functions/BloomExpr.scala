package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native, CODEGEN'D expression.
  *
  * The filter object rides the expression as a reference object (same
  * pattern as NearestCellsExpr's centroid matrix): it serializes with the
  * plan to executors once, and the generated code calls straight into
  * `BloomFilterImpl.mightContainLong/Binary` — the probe stays inside the
  * scan's whole-stage-codegen span, so a pruned scan pays two hash ops
  * per row, never a virtual-call break in the hot loop.
  *
  * No false negatives (a Bloom guarantee), so `filter(mightContain(k))`
  * followed by the real join is EXACTLY the join — false positives are
  * rows the join drops anyway. That identity is what makes the pruned
  * join oracle-checkable bit-for-bit against the plain join.
  */
object BloomExpr {
  import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}

  def mightContain(key: Column, bf: BloomFilter): Column =
    toCol(BloomMightContainExpr(toExpr(key), bf))
}

case class BloomMightContainExpr(child: Expression, bf: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom probe supports long/int/string keys, got $t")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType    => bf.mightContainLong(v.asInstanceOf[Long])
    case IntegerType => bf.mightContainLong(v.asInstanceOf[Int].toLong)
    case StringType  => bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf, classOf[BloomFilter].getName)
    child.dataType match {
      case LongType    => defineCodeGen(ctx, ev, c => s"$bfRef.mightContainLong($c)")
      case IntegerType => defineCodeGen(ctx, ev, c => s"$bfRef.mightContainLong((long) $c)")
      case StringType  => defineCodeGen(ctx, ev, c => s"$bfRef.mightContainBinary($c.getBytes())")
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_bloom_might_contain"
}
