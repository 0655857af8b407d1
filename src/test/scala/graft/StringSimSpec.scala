package graft

import graft.functions.StringSim
import org.apache.spark.sql.functions._

/** JaroWinklerExpr vs literature values and the empirically-probed DuckDB
  * semantics (every expected constant below was read back from DuckDB's
  * jaro_winkler_similarity / jaro_similarity on this machine — bit-level
  * doubles, not approximations).
  */
class StringSimSpec extends SparkSpec {

  private def jw(a: String, b: String): Double = StringSim.jaroWinklerLocal(a, b)

  test("classic literature pairs match DuckDB bit-for-bit") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("Customer#000000123", "Customer#000000124") == 0.9777777777777777)
    assert(jw("aaaaaaaaaa", "aaaaaaaaab") == 0.96)
  }

  test("boost threshold: prefix bonus applies only above jaro 0.7") {
    // jaro = 0.5 with common prefix 'ab' — DuckDB returns 0.5, not 0.6
    assert(jw("abcdefgh", "abzzzzzz") == 0.5)
  }

  test("window and transposition edges") {
    assert(jw("ab", "ba") == 0.0)            // window 0: no cross matches
    assert(jw("abab", "baba") == 0.8333333333333334) // all matched, t = 2
    assert(jw("CRAT", "ATRC") == 0.5)        // single match, window 1
    assert(jw("aa", "aaaa") == 0.8666666666666667) // jaro 0.8333 + prefix-2 boost
    assert(jw("a", "a") == 1.0)
    assert(jw("ab", "ab") == 1.0)
  }

  test("empty semantics follow DuckDB: any empty side scores 0") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("", "a") == 0.0)
  }

  test("expression evaluates distributed and null-propagates") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"), (null, "x"))
      .toDF("a", "b")
      .select(StringSim.jaroWinkler(col("a"), col("b")).as("jw"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(0) == 0.9611111111111111)
    assert(got(1) == 0.8400000000000001)
    assert(got(2) == null)
  }

  test("doGenCode compiles: identical results under CODEGEN_ONLY") {
    import spark.implicits._
    val was = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = Seq(("martha", "marhta"), ("aa", "aaaa"))
        .toDF("a", "b")
        .select(StringSim.jaroWinkler(col("a"), col("b")).as("jw"))
        .collect().map(_.getDouble(0))
      assert(got.toSeq == Seq(0.9611111111111111, 0.8666666666666667))
    } finally was match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("symmetry and range on corpus-shaped names") {
    val names = (0 until 50).map(i => f"Customer#$i%09d")
    for (a <- names.take(10); b <- names.take(10)) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == jw(b, a))
      if (a == b) assert(s == 1.0)
    }
  }
}
