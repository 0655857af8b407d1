package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass gram-matrix accumulation — the distributed half of PCA /
  * covariance: for pre-quantized integer vectors q, accumulate the upper
  * triangle Σ qᵢ·qⱼ (i ≤ j), the linear sums Σ qᵢ, and the count, all as
  * LONG integer sums — order-free, overflow-safe for milli-quantized unit
  * vectors up to ~10¹² rows, and therefore ENGINE-EXACT (a float gram can
  * never hash-match across engines). One buffer of d(d+1)/2 + d + 1 longs
  * per partition; merge is elementwise addition — the textbook mergeable
  * aggregate, so the corpus is read once and only k-byte buffers shuffle.
  */
object GramAgg {
  import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}

  /** Flat buffer [Σqᵢqⱼ upper-tri row-major, Σqᵢ ×d, n] for `vec` (an
    * array<long> column of length `dim`).
    */
  def gram(vec: Column, dim: Int): Column =
    toCol(GramFlatAgg(toExpr(vec), dim).toAggregateExpression())

  /** (i, j) of flat upper-triangle position p for dimension d. */
  def unflatten(p: Int, d: Int): (Int, Int) = {
    var i = 0
    var base = 0
    while (base + (d - i) <= p) { base += d - i; i += 1 }
    (i, i + (p - base))
  }
}

case class GramFlatAgg(vecE: Expression, dim: Int,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, "gram: dim must be positive")
  private val triSize = dim * (dim + 1) / 2
  private val bufSize = triSize + dim + 1

  override def children: Seq[Expression] = Seq(vecE)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufSize)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = vecE.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), dim)
      val q = new Array[Long](dim)
      var i = 0
      while (i < n) { q(i) = arr.getLong(i); i += 1 }
      var p = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) { buf(p) += q(i) * q(j); p += 1; j += 1 }
        buf(triSize + i) += q(i)
        i += 1
      }
      buf(bufSize - 1) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufSize) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](bufSize * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bufSize)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramFlatAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramFlatAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GramFlatAgg =
    copy(vecE = c(0))
  override def prettyName: String = "graft_gram"
}
