package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Fused classifier-scoring aggregate: input rows are (cls, m) partial
  * scores, the buffer accumulates Σm per class (order-free integer sums,
  * map merge = elementwise add), and eval returns the argmin by
  * (sum, cls) as struct(pred_cls, nll_micro).
  *
  * Why an aggregate and not sum-then-window: fusing the per-class sum
  * and the argmin into ONE aggregate halves the shuffles in the batch
  * scorer AND makes the scoring plan legal on a STREAM — Structured
  * Streaming allows a single stateful aggregation, so "train once, score
  * the stream" (stream_nbc) needs exactly this shape. The buffer is
  * |classes| entries — bounded model-side state, never corpus-sized.
  */
object ArgminAgg {
  import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}

  def argminSum(cls: Column, m: Column): Column =
    toCol(ArgminSumAgg(toExpr(cls), toExpr(m)).toAggregateExpression())
}

case class ArgminSumAgg(clsE: Expression, mE: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(clsE, mE)
  override def dataType: DataType = StructType(Seq(
    StructField("pred_cls", StringType, nullable = true),
    StructField("nll_micro", LongType, nullable = true)))
  override def nullable: Boolean = true

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val c = clsE.eval(input)
    val m = mE.eval(input)
    if (c != null && m != null) {
      val k = c.asInstanceOf[UTF8String].toString
      buf.update(k, buf.getOrElse(k, 0L) + m.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    if (buf.isEmpty) null
    else {
      // argmin by (sum, cls) — the deterministic lexicographic tie-break
      val (cls, s) = buf.minBy { case (k, v) => (v, k) }
      InternalRow(UTF8String.fromString(cls), s)
    }
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.update(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgminSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgminSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ArgminSumAgg =
    copy(clsE = c(0), mE = c(1))
  override def prettyName: String = "graft_argmin_sum"
}
