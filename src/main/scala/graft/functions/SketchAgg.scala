package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable cardinality / frequency sketches — the aggregation-side
  * counterpart of the LSH family: fixed-size buffers that merge
  * associatively, so a 100 TB scan reduces to one map-side combine plus a
  * shuffle of kilobyte payloads per group (never the raw keys).
  *
  * Both sketches hash with the repo-wide deterministic primitives
  * (FNV-1a 64 + fixed multiply-add permutations, Hashing.scala) — no seed,
  * no object identity — which makes the register/counter arrays
  * bit-reproducible under any partitioning AND exactly replayable in a
  * DuckDB oracle (HUGEINT arithmetic mod 2^64), the same trick that
  * verified MinHash/SimHash/IVF/PQ.
  *
  * Reference behavioral anchor: the reference engine exposes only exact
  * aggregation (app/operations/fold.py); sketches are part of the
  * beyond-reference scale surface (SURVEY.md §2 "LLM-data-pipeline ops").
  *
  * HyperLogLog: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the
  * analysis of a near-optimal cardinality estimation algorithm", AofA 2007.
  * Count-Min: Cormode, Muthukrishnan, "An improved data stream summary:
  * the count-min sketch and its applications", J. Algorithms 2005. Both
  * public algorithms.
  */
object SketchAgg {
  import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}

  /** HyperLogLog register vector (array<int> of 2^p registers) for a
    * string key column. Registers only — the estimate is computed
    * downstream with codegen'd array expressions (ordered fold), keeping
    * the aggregate itself pure integer max-merge.
    */
  def hllRegisters(key: Column, p: Int): Column =
    toCol(HllRegistersAgg(toExpr(key), p).toAggregateExpression())

  /** Count-Min counter matrix (array<long>, row-major depth × 2^logW) for
    * a string key column.
    */
  def cmsCounters(key: Column, depth: Int, logW: Int): Column =
    toCol(CmsAgg(toExpr(key), depth, logW).toAggregateExpression())

  /** Register index (top p bits) and rank (position of the first 1-bit in
    * the remaining 64-p bits, 64-p+1 if none) of a hashed key — the
    * per-row HLL update, shared with tests.
    */
  def hllIdxRho(h: Long, p: Int): (Int, Int) = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rho = if (w == 0L) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
    (idx, rho)
  }

  /** Point estimate min_i counters[i·w + bucket_i(key)] for a key against
    * a Count-Min counter array. A native expression (not Column
    * arithmetic) because the bucket derivation multiplies mod 2^64 —
    * wrapping that ANSI-mode Column math would reject.
    */
  def cmsEstimate(cms: Column, key: Column, depth: Int, logW: Int): Column =
    toCol(CmsEstExpr(toExpr(cms), toExpr(key), depth, logW))

  /** KMV / theta bottom-k sketch (Beyer et al., SIGMOD 2007): the k
    * smallest DISTINCT fnv1a64∘fmix64 key hashes in unsigned order, as
    * array<long> (unsigned-ascending, signed longs carrying the unsigned
    * bits). Merge = set union + trim — order-free, so streamed state
    * equals batch state. Downstream (plain array expressions): θ = the
    * k-th smallest (2⁶⁴ when not full), estimate = retained · 2⁶⁴ div θ.
    */
  def kmvBottomK(key: Column, k: Int): Column =
    toCol(KmvAgg(toExpr(key), k).toAggregateExpression())

  /** Misra-Gries heavy-hitters candidates over a LONG key column:
    * array<struct<key, est>> (est desc, key asc). See MisraGriesAgg for
    * the deterministic-guarantee discipline.
    */
  def misraGries(key: Column, k: Int): Column =
    toCol(MisraGriesAgg(toExpr(key), k).toAggregateExpression())
}

/** (counters array<long>, key string) → min over the depth rows of the
  * key's bucket counter. Uses the same fixed permutation constants as
  * CmsAgg — the probe must hash exactly as the build did.
  */
case class CmsEstExpr(cmsE: Expression, keyE: Expression, depth: Int, logW: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def left: Expression = cmsE
  override def right: Expression = keyE
  private val w = 1 << logW
  @transient private lazy val (as, bs) = Hashing.permConsts(depth)
  override def dataType: DataType = LongType
  override def nullSafeEval(cms: Any, key: Any): Any = {
    val arr = cms.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = key.asInstanceOf[UTF8String].getBytes
    val h = Hashing.fnv1a64(b, 0, b.length)
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      val bucket = ((as(i) * h + bs(i)) >>> (64 - logW)).toInt
      val c = arr.getLong(i * w + bucket)
      if (c < est) est = c
      i += 1
    }
    est
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(cmsE = l, keyE = r)
  override def prettyName: String = "graft_cms_est"
}

/** One HLL register array per group. Buffer: 2^p bytes (rho ≤ 64-p+1 < 128
  * fits a byte); merge = elementwise max — order-free, so the result is
  * identical under any partitioning/combine schedule.
  */
case class HllRegistersAgg(keyE: Expression, p: Int,
                           mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, "hll: p must be in [4,16]")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(keyE)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = keyE.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[UTF8String].getBytes
      val h = Hashing.fmix64(Hashing.fnv1a64(b, 0, b.length))
      val (idx, rho) = SketchAgg.hllIdxRho(h, p)
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  // defensive copies (1 KiB each — negligible): Spark currently copies on
  // UnsafeRow write/getBinary read, but returning the live buffer would
  // alias mutable state if that contract ever changed
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllRegistersAgg =
    copy(keyE = c(0))
  override def prettyName: String = "graft_hll"
}

/** Count-Min counter matrix. Row i uses the repo's fixed multiply-add
  * permutation i over the key's FNV hash, taking the top logW bits as the
  * bucket — depth independent hash rows, width-2^logW counters each.
  * Buffer: depth·2^logW longs; merge = elementwise sum (order-free).
  * Point estimate (downstream expression): min over rows of the bucket
  * counter — a one-sided overestimate with the classic (ε=e/w, δ=e^-d)
  * guarantee.
  */
case class CmsAgg(keyE: Expression, depth: Int, logW: Int,
                  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, "cms: depth in [1,16]")
  require(logW >= 4 && logW <= 20, "cms: logW in [4,20]")
  private val w = 1 << logW
  private val size = depth * w
  @transient private lazy val (as, bs) = Hashing.permConsts(depth)

  override def children: Seq[Expression] = Seq(keyE)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](size)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = keyE.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[UTF8String].getBytes
      val h = Hashing.fnv1a64(b, 0, b.length)
      var i = 0
      while (i < depth) {
        val bucket = ((as(i) * h + bs(i)) >>> (64 - logW)).toInt
        buf(i * w + bucket) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](size * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(size)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsAgg =
    copy(keyE = c(0))
  override def prettyName: String = "graft_cms"
}

/** Bottom-k distinct unsigned key hashes per group. Buffer: a TreeSet in
  * unsigned order, ≤ k longs (k·8 bytes serialized) — set-union merge is
  * associative, commutative, and idempotent, so the sketch is identical
  * under any partitioning, combine schedule, or micro-batch slicing
  * (stream ≡ batch, the stream_hll property). TreeSet membership gives
  * the DISTINCT semantics; eviction from the top keeps updates O(log k).
  */
case class KmvAgg(keyE: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16 && k <= 65536, "kmv: k must be in [16, 65536]")

  private def newBuf(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](new java.util.Comparator[java.lang.Long] {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })

  override def children: Seq[Expression] = Seq(keyE)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] = newBuf()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = keyE.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[UTF8String].getBytes
      val h = Hashing.fmix64(Hashing.fnv1a64(b, 0, b.length))
      if (buf.size < k) buf.add(h)
      else if (java.lang.Long.compareUnsigned(h, buf.last()) < 0) {
        if (buf.add(h)) buf.pollLast()
      }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (a.size < k) a.add(h)
      else if (java.lang.Long.compareUnsigned(h, a.last()) < 0) {
        if (a.add(h)) a.pollLast()
      } else return a // b is sorted ascending: the rest only gets larger
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = newBuf()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvAgg =
    copy(keyE = c(0))
  override def prettyName: String = "graft_kmv"
}

/** Misra-Gries heavy-hitters summary with k counters (Misra & Gries 1982;
  * mergeable form: Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable
  * summaries", PODS 2012 — public algorithms). Buffer: ≤k (key, count)
  * pairs; update decrements all counters when a new key finds the buffer
  * full; merge sums both maps then subtracts the (k+1)-th largest count.
  *
  * DETERMINISTIC GUARANTEES (any merge order, any partitioning):
  *   f(x) − n/(k+1) ≤ est(x) ≤ f(x), and every x with f(x) > n/(k+1) is
  *   in the output. The exact candidate counts DO depend on merge order,
  *   so queries must expose only the theorem-level facts (presence of
  *   guaranteed hitters, bound satisfaction), never raw estimates —
  *   the sk_hll error-envelope discipline.
  */
case class MisraGriesAgg(keyE: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Long]] {

  require(k >= 1 && k <= 4096, "mg: k must be in [1,4096]")

  override def children: Seq[Expression] = Seq(keyE)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): scala.collection.mutable.LongMap[Long] =
    scala.collection.mutable.LongMap.empty[Long]

  override def update(buf: scala.collection.mutable.LongMap[Long],
                      input: InternalRow): scala.collection.mutable.LongMap[Long] = {
    val v = keyE.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (buf.contains(x)) buf(x) += 1L
      else if (buf.size < k) buf(x) = 1L
      else {
        // decrement-all: the classic O(k) step; zeros drop out
        val dead = buf.iterator.filter(_._2 == 1L).map(_._1).toArray
        buf.transformValuesInPlace(c => c - 1L)
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: scala.collection.mutable.LongMap[Long],
                     b: scala.collection.mutable.LongMap[Long]): scala.collection.mutable.LongMap[Long] = {
    b.foreach { case (key, c) => a(key) = a.getOrElse(key, 0L) + c }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything (mergeable MG)
      val counts = a.values.toArray.sortBy(-_)
      val cut = counts(k)
      val dead = a.iterator.filter(_._2 <= cut).map(_._1).toArray
      a.transformValuesInPlace(c => c - cut)
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: scala.collection.mutable.LongMap[Long]): Any = {
    val rows = buf.toArray.sortBy { case (key, est) => (-est, key) }
      .map { case (key, est) => InternalRow(key, est) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: scala.collection.mutable.LongMap[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) => out.writeLong(key); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.LongMap[Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m(in.readLong()) = in.readLong(); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(keyE = c(0))
  override def prettyName: String = "graft_mg"
}
