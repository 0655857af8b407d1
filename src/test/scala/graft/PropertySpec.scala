package graft

import graft.functions.Hashing
import graft.operators.Ops
import graft.plans._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based laws (ScalaCheck driven through raw Prop checks):
  * fold∘unfold round-trip, equality idempotence, concatenation null law,
  * arithmetic typing vs a model interpreter, hash determinism laws.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("law: unfold∘fold is identity on unique (id, key) frames") {
    val gen = for {
      rows <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(-1e6, 1e6)))
    } yield rows.toMap.toList // unique ids
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("id", "a").withColumn("b", org.apache.spark.sql.functions.col("a") * 2)
      val folded = Ops.fold(df, Fold(Seq("id"), Seq("a", "b"), "key", "value"))
      val unfolded = Ops.unfold(folded, Unfold(Seq("id"), "key", "value"))
      val got = unfolded.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      val want = rows.map { case (id, a) => (id, a, a * 2) }.toSet
      got == want
    }, n = 10)
  }

  test("law: equality op is idempotent and preserves row count") {
    val gen = Gen.nonEmptyListOf(Gen.alphaNumStr)
    check(Prop.forAll(gen) { xs =>
      val df = xs.zipWithIndex.toDF("s", "i")
      val once = Ops.equality(df, Equality("s", Some("t")))
      val twice = Ops.equality(once, Equality("s", Some("t")))
      twice.count() == df.count() &&
        twice.select("t").collect().map(_.getString(0)).toSeq ==
          df.select("s").collect().map(_.getString(0)).toSeq
    }, n = 10)
  }

  test("law: concatenation propagates null iff any input is null") {
    val gen = Gen.listOfN(6, Gen.option(Gen.alphaStr))
    check(Prop.forAll(gen, Gen.alphaStr) { (vals, sep) =>
      val df = vals.zipWithIndex.map { case (v, i) => (v.orNull, i) }.toDF("a", "i")
      val r = Ops.concatenation(
        df.withColumn("b", org.apache.spark.sql.functions.lit("x")),
        Concatenation(Seq("a", "b"), sep, Some("c")))
      r.collect().forall { row =>
        val a = row.getAs[String]("a")
        val c = row.getAs[String]("c")
        if (a == null) c == null else c == a + sep + "x"
      }
    }, n = 15)
  }

  test("law: arithmetic types follow the model (int ops → long, / → double)") {
    check(Prop.forAll(Gen.choose(-1000L, 1000L), Gen.choose(1L, 1000L)) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val plus = Ops.arithmetic(df, Arithmetic(Seq("a", "b"), "+", Some("r")))
      val times = Ops.arithmetic(df, Arithmetic(Seq("a", "b"), "*", Some("r")))
      val div = Ops.arithmetic(df, Arithmetic(Seq("a", "b"), "/", Some("r")))
      plus.schema("r").dataType == LongType &&
        times.schema("r").dataType == LongType &&
        div.schema("r").dataType == DoubleType &&
        plus.collect().head.getLong(2) == a + b &&
        div.collect().head.getDouble(2) == a.toDouble / b
    }, n = 15)
  }

  test("law: simhash of permuted token bags is identical; hamming is a metric on samples") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.identifier)) { words =>
      val t1 = words.mkString(" ")
      val t2 = scala.util.Random.shuffle(words).mkString(" ")
      Hashing.simhash64(t1) == Hashing.simhash64(t2)
    })
    check(Prop.forAll(Gen.identifier, Gen.identifier) { (x, y) =>
      val (a, b) = (Hashing.simhash64(x), Hashing.simhash64(y))
      val d = java.lang.Long.bitCount(a ^ b)
      d >= 0 && d <= 64 && (x != y || d == 0)
    })
  }

  test("law: textMinhash equals the minhash of explicitly-built shingles, and agreement estimates jaccard=1 for identical docs") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.identifier)) { words =>
      val text = words.mkString(" ")
      val local = Hashing.textMinhashLocal(text, 3, 16).toSeq
      val viaDf = Seq(Tuple1(text)).toDF("t")
        .select(Hashing.textMinhash(org.apache.spark.sql.functions.col("t"), 3, 16))
        .collect().head.getSeq[Long](0)
      local == viaDf
    }, n = 10)
  }
}
