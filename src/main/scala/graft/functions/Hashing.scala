package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-hashing primitives used by dedup/fingerprinting.
  *
  * SimHash is exposed as a native Catalyst Expression (not a Scala UDF): it
  * evaluates directly on UTF8String without Row boxing/encoding, and
  * registers in the session FunctionRegistry so it is usable from SQL too.
  * (CodegenFallback: the per-row cost is dominated by tokenize+hash, not
  * the virtual call; doGenCode would buy little here.)
  */
object Hashing {

  /** FNV-1a 64-bit over UTF-8 bytes — deterministic across JVMs/executors
    * (no seed, no object identity).
    */
  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    fnv1a64(b, 0, b.length)
  }

  /** 64-bit SimHash over whitespace tokens: each token hashed with FNV-1a;
    * bit b of the result is the sign of the sum over tokens of ±1 per
    * token-hash bit b. Near-duplicate texts differ in few bits (compare by
    * Hamming distance). Charikar, "Similarity estimation techniques from
    * rounding algorithms", STOC 2002 — public algorithm.
    */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    var start = -1
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i <= bytes.length) {
      val ws = i == bytes.length || bytes(i) == ' ' || bytes(i) == '\n' ||
        bytes(i) == '\t' || bytes(i) == '\r'
      if (!ws && start < 0) start = i
      if (ws && start >= 0) {
        val h = fnv1a64(bytes, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        start = -1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Registers hashing functions in the session registry (idempotent).
    * Call before using the `simhash64`/`hamming64`/`minhashSig` Columns.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64Expr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hamming64", exprs => Hamming64Expr(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashSigExpr(exprs.head, exprs(1)), "built-in")
  }

  def simhash64(c: Column): Column = call_function("graft_simhash64", c)
  def hamming64(a: Column, b: Column): Column = call_function("graft_hamming64", a, b)
  def minhashSig(shingles: Column, k: Int): Column =
    call_function("graft_minhash", shingles, org.apache.spark.sql.functions.lit(k))

  /** Deterministic multiply-add permutation constants (odd multipliers) for
    * the MinHash family — fixed seed, identical on every executor.
    */
  private[functions] def permConsts(k: Int): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(0x5EEDL)
    val as = Array.fill(k)(rnd.nextLong() | 1L)
    val bs = Array.fill(k)(rnd.nextLong())
    (as, bs)
  }
}

/** string → 64-bit simhash. */
case class SimHash64Expr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Hashing.simhash64(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash64"
}

/** array<string> shingles → array<long> of k MinHash values. A custom
  * Expression rather than higher-order functions because the HOF form
  * (k nested aggregates, string-concat seeding) re-hashes every shingle k
  * times with per-eval allocations; here each shingle is hashed ONCE and
  * the k permutations are multiply-add derivations — one tight JVM loop
  * per row, the pattern a 100 TB dedup pass needs.
  */
case class MinHashSigExpr(child: Expression, kExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def left: Expression = child
  override def right: Expression = kExpr
  private lazy val k: Int = kExpr match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
    case _ => throw new IllegalArgumentException("minhash k must be a literal")
  }
  private lazy val (as, bs) = Hashing.permConsts(k)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any, kv: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val b = s.getBytes
      val h = Hashing.fnv1a64(b, 0, b.length)
      var j = 0
      while (j < k) {
        val v = as(j) * h + bs(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(child = l, kExpr = r)
  override def prettyName: String = "graft_minhash"
}

/** (long, long) → Hamming distance of the two 64-bit values. */
case class Hamming64Expr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_hamming64"
}
