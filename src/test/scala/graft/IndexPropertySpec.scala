package graft

import graft.ext.{Dedup, LshIndex, Search}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized laws for the persisted-index paths: the disk probe must
  * agree with the in-memory computation on ARBITRARY corpora (not just
  * the fixture), and degenerate corpora (all docs sub-shingle-length,
  * empty cohorts) must degrade to empty results, never crash.
  */
class IndexPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // small vocabulary => real shingle collisions => near-dups actually occur
  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val doc = Gen.choose(0, 8).flatMap(len => Gen.listOfN(len, word))
    .map(_.mkString(" "))
  private val corpus = Gen.choose(6, 14).flatMap(n => Gen.listOfN(n, doc))
  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  test("law: ledger probe == in-memory cross-cohort pairs on random corpora") {
    check(Prop.forAll(corpus) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val split = texts.size / 2
      val path = s"${sys.props("java.io.tmpdir")}/graft-prop-lsh/${counter.incrementAndGet()}"
      LshIndex.write(df.filter(col("doc_id") < split), "doc_id", "text", path,
        files = 2)
      val got = LshIndex.probePairs(spark, path,
          df.filter(col("doc_id") >= split), "doc_id", "text", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = Dedup.minhashPairs(df, "doc_id", "text", n = 3, k = 64,
          bands = 16, threshold = 0.5)
        .filter(col("id_a") < split && col("id_b") >= split)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      got == want
    }, n = 6)
  }

  test("law: persisted BM25 probe == scan ranking on random corpora and terms") {
    val termsGen = Gen.someOf(Seq("alpha", "beta", "unicorn")).map(_.toList)
      .suchThat(_.nonEmpty)
    check(Prop.forAll(corpus, termsGen) { (texts, terms) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val path = s"${sys.props("java.io.tmpdir")}/graft-prop-bm25/${counter.incrementAndGet()}"
      Search.writeIndex(df, "doc_id", "text", path, files = 2)
      def rows(r: org.apache.spark.sql.DataFrame) =
        r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
      rows(Search.probeBm25(spark, path, "doc_id", terms, 5)) ==
        rows(Search.bm25TopK(df, "doc_id", "text", terms, 5))
    }, n = 6)
  }

  test("degenerate ledgers and probes degrade to empty, never crash") {
    // every ledger doc below shingle length => empty (schema-less) bands
    val short = Seq((0L, "a b"), (1L, "c")).toDF("doc_id", "text")
    val inc = Seq((10L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val p1 = s"${sys.props("java.io.tmpdir")}/graft-prop-lsh/deg1"
    LshIndex.write(short, "doc_id", "text", p1)
    assert(LshIndex.probePairs(spark, p1, inc, "doc_id", "text", 0.5).count() == 0)
    // empty incoming batch against a real ledger
    val p2 = s"${sys.props("java.io.tmpdir")}/graft-prop-lsh/deg2"
    LshIndex.write(inc, "doc_id", "text", p2)
    assert(LshIndex.probePairs(spark, p2, short.filter(lit(false)),
      "doc_id", "text", 0.5).count() == 0)
    // empty-corpus BM25 index: probe returns zero hits
    val p3 = s"${sys.props("java.io.tmpdir")}/graft-prop-bm25/deg"
    Search.writeIndex(inc.filter(lit(false)), "doc_id", "text", p3)
    assert(Search.probeBm25(spark, p3, "doc_id", Seq("alpha"), 5).count() == 0)
  }
}
