package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity primitives beyond edit distance.
  *
  * Jaro-Winkler (Jaro 1989; Winkler 1990 — public algorithms) as a native
  * Catalyst Expression: Spark has `levenshtein` but no Jaro family, while
  * record-linkage blocking (the er_* family) traditionally scores
  * candidates with Winkler's prefix-boosted Jaro. The implementation
  * mirrors the rapidfuzz formulation that DuckDB ships as
  * `jaro_winkler_similarity` — same match-window rule, same half-
  * transposition count, same IEEE double arithmetic ORDER — so the
  * integer (m, t, len, prefix) inputs produce bit-identical doubles on
  * both engines and micro-rounded values hash-match exactly:
  *   - window = max(len1, len2)/2 - 1 (floored, min 0)
  *   - sim    = (m/len1 + m/len2 + (m - t/2)/m) / 3        [doubles]
  *   - boost  = sim > 0.7 ? sim + prefix·0.1·(1 - sim) : sim, prefix ≤ 4
  *   - either string empty → 0.0 (DuckDB parity; classic Jaro says 1.0
  *     for both-empty, DuckDB returns 0.0 — verified empirically)
  * Operates on UTF-8 BYTES (DuckDB VARCHARs are compared byte-wise); for
  * ASCII corpora this equals codepoint semantics.
  */
object StringSim {

  import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}

  def jaroWinkler(a: Column, b: Column): Column =
    toCol(JaroWinklerExpr(toExpr(a), toExpr(b)))

  /** Jaro similarity on UTF-8 bytes — integer match/transposition counts
    * fed through the exact double-arithmetic order rapidfuzz uses.
    */
  def jaro(a: Array[Byte], b: Array[Byte]): Double = {
    val len1 = a.length
    val len2 = b.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched2 = new Array[Boolean](len2)
    val matchIdx1 = new Array[Int](len1)
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = -1
      while (j <= hi && found < 0) {
        if (!matched2(j) && a(i) == b(j)) found = j
        j += 1
      }
      matchIdx1(i) = found
      if (found >= 0) { matched2(found) = true; m += 1 }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars of each side in their own order
    val bOrder = new Array[Byte](m)
    var j = 0
    var c = 0
    while (j < len2) { if (matched2(j)) { bOrder(c) = b(j); c += 1 }; j += 1 }
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (matchIdx1(i) >= 0) { if (a(i) != bOrder(k)) t += 1; k += 1 }
      i += 1
    }
    val half = t / 2
    (m.toDouble / len1 + m.toDouble / len2 + (m - half).toDouble / m) / 3.0
  }

  /** Winkler prefix boost over [[jaro]] — boost applies only above 0.7,
    * prefix capped at 4, weight 0.1 (the classic constants; arithmetic
    * order matches rapidfuzz: sim + (prefix·0.1)·(1.0 − sim)).
    */
  def jaroWinkler(a: Array[Byte], b: Array[Byte]): Double = {
    val sim = jaro(a, b)
    if (sim > 0.7) {
      val maxP = math.min(math.min(a.length, b.length), 4)
      var p = 0
      while (p < maxP && a(p) == b(p)) p += 1
      sim + p * 0.1 * (1.0 - sim)
    } else sim
  }

  /** JVM/String mirror for tests. */
  def jaroWinklerLocal(a: String, b: String): Double =
    jaroWinkler(a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

/** jaro_winkler_similarity(a, b) → double in [0, 1]. Null if either side
  * is null (BinaryExpression nullSafeEval). Real doGenCode (a static call
  * into [[StringSim]]): the expression stays INSIDE whole-stage codegen —
  * no per-row virtual eval() call, no fallback-induced codegen split in
  * the blocked self-join's probe loop.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSim.jaroWinkler($a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
