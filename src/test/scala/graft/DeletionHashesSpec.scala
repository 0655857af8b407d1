package graft

import graft.functions.DeletionHashesExpr
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Laws for the native deletion-neighborhood hasher that replaced the
  * string-materializing SymSpell blocking: the candidate-completeness
  * theorem (ed(s,t) ≤ d ⇒ the d-deletion hash sets intersect) checked
  * against randomly mutated strings — including multibyte/surrogate
  * codepoints, since deletions are codepoint-level — plus block-key
  * separation and purity.
  */
class DeletionHashesSpec extends SparkSpec {

  private def hashes(s: String, blk: String, d: Int): Set[Long] = {
    val e = DeletionHashesExpr(
      Literal(UTF8String.fromString(s), StringType),
      Literal(UTF8String.fromString(blk), StringType), d)
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSet
  }

  private def check(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // codepoint-level levenshtein (reference implementation for the law)
  private def lev(a: Array[Int], b: Array[Int]): Int = {
    val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
      if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private val alphabet: Gen[Int] =
    Gen.oneOf(Gen.choose('a'.toInt, 'e'.toInt), Gen.const('0'.toInt),
      Gen.const(0xE9 /* é */), Gen.const(0x6F22 /* 漢 */),
      Gen.const(0x1F600 /* emoji, surrogate pair in UTF-16 */))

  private val strGen: Gen[String] = for {
    n <- Gen.choose(0, 14)
    cps <- Gen.listOfN(n, alphabet)
  } yield new String(cps.toArray, 0, cps.length)

  private def mutate(s: String, edits: Int, seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    var cps = s.codePoints().toArray.toBuffer
    val alpha = Array('a'.toInt, 'b'.toInt, 0xE9, 0x6F22, 0x1F600)
    for (_ <- 0 until edits) rnd.nextInt(3) match {
      case 0 if cps.nonEmpty => cps.remove(rnd.nextInt(cps.length)) // delete
      case 1 if cps.nonEmpty => cps(rnd.nextInt(cps.length)) = alpha(rnd.nextInt(alpha.length))
      case _ => cps.insert(rnd.nextInt(cps.length + 1), alpha(rnd.nextInt(alpha.length)))
    }
    new String(cps.toArray, 0, cps.length)
  }

  test("law: ed(s,t) <= d implies the d-deletion hash sets intersect") {
    val gen = for {
      s <- strGen; edits <- Gen.choose(0, 2); seed <- Gen.choose(0L, Long.MaxValue)
    } yield (s, mutate(s, edits, seed))
    check(Prop.forAll(gen) { case (s, t) =>
      val d = lev(s.codePoints().toArray, t.codePoints().toArray)
      d > 2 || hashes(s, "B", d).intersect(hashes(t, "B", d)).nonEmpty
    })
  }

  test("law: different block keys never share candidate hashes") {
    check(Prop.forAll(strGen, strGen) { (s, t) =>
      hashes(s, "block-1", 2).intersect(hashes(t, "block-2", 2)).isEmpty
    })
  }

  test("law: pure function — repeated eval is identical; size matches d") {
    check(Prop.forAll(strGen) { s =>
      val n = s.codePoints().toArray.length
      val h2 = hashes(s, "B", 2)
      hashes(s, "B", 0).size <= 1 + 0 &&
        hashes(s, "B", 1).subsetOf(h2) &&
        hashes(s, "B", 2) == h2 &&
        h2.size <= 1 + n + n * (n - 1) / 2
    })
  }

  test("identical strings in the same block share the identity hash") {
    assert(hashes("Customer#01", "7", 2).intersect(hashes("Customer#01", "7", 0)).nonEmpty)
    assert(hashes("", "7", 2) == hashes("", "7", 0)) // empty string: just itself
  }
}
