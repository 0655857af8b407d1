package graft

import graft.ext.SimJoin
import org.apache.spark.sql.functions._

/** SimJoin.jaccardJoin must equal the naive all-pairs join EXACTLY (it is
  * an exact algorithm — prefix filtering only prunes candidates that
  * provably cannot reach the threshold).
  */
class SimJoinSpec extends SparkSpec {

  private def bruteForce(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, s) =>
      id -> s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      uni = sa.size + sb.size - inter
      if uni > 0 && inter.toDouble / uni >= t
    } yield (ia, ib, inter, uni)).toSet
  }

  private def run(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    SimJoin.jaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text", t)
      .select("id_a", "id_b", "inter", "uni")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("equals brute force on a synthetic corpus with planted edge cases") {
    val docs: Seq[(Long, String)] = Seq(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta zeta",        // J=4/6 with 1
      3L -> "alpha beta gamma delta epsilon",     // identical to 1
      4L -> "alpha",                              // single token
      5L -> "alpha",                              // identical single token
      6L -> "",                                   // empty → excluded
      7L -> "  ",                                 // whitespace only → excluded
      8L -> "zeta eta theta iota kappa",
      9L -> "Alpha BETA gamma DELTA epsilon",     // case-folds to 1
      10L -> "unique1 unique2 unique3",
      11L -> "alpha alpha alpha beta beta gamma delta epsilon" // dup tokens collapse to 1's set
    )
    for (t <- Seq(0.5, 0.7, 0.9, 1.0)) {
      assert(run(docs, t) === bruteForce(docs, t), s"threshold $t")
    }
  }

  test("equals brute force on the sf0.001 documents corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    import spark.implicits._
    val got = SimJoin.jaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text", 0.7)
      .select("id_a", "id_b", "inter", "uni")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = bruteForce(docs, 0.7)
    assert(got === want)
    assert(want.nonEmpty, "corpus should contain near-dup pairs at t=0.7")
  }

  test("tie-heavy vocabulary: every token has the same frequency") {
    // every token appears exactly twice → the tf component of the
    // (tf, token) composite order is a total tie and the order falls
    // entirely to the token tiebreak; pair set must still be exact
    val docs: Seq[(Long, String)] = Seq(
      1L -> "a b c d e",
      2L -> "a b c d f",
      3L -> "e f g h i",
      4L -> "g h i j k",
      5L -> "j k l m n",
      6L -> "l m n o p",
      7L -> "o p q r s",
      8L -> "q r s t u",
      9L -> "t u v w x",
      10L -> "v w x y z",
      11L -> "y z a1 b1 c1",
      12L -> "a1 b1 c1 d1 e1",
      13L -> "d1 e1 f1 g1 h1",
      14L -> "f1 g1 h1 i1 j1",
      15L -> "i1 j1 k1 l1 m1",
      16L -> "k1 l1 m1 n1 o1",
      17L -> "n1 o1 p1 q1 r1",
      18L -> "p1 q1 r1 s1 t1",
      19L -> "s1 t1 u1 v1 w1",
      20L -> "u1 v1 w1")
    val freqs = docs.flatMap(_._2.split("\\s+")).groupBy(identity).values.map(_.size).toSet
    assert(freqs === Set(2), "fixture invariant: every token appears exactly twice")
    for (t <- Seq(0.5, 0.6, 0.8)) {
      assert(run(docs, t) === bruteForce(docs, t), s"threshold $t")
    }
  }

  test("plan contains no Window operator (no single-partition vocabulary sort)") {
    import spark.implicits._
    val docs = Seq(1L -> "a b c", 2L -> "a b d").toDF("doc_id", "text")
    val plan = SimJoin.jaccardJoin(docs, "doc_id", "text", 0.5)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, "jaccardJoin must not plan any Window node")
  }

  test("threshold boundary: pairs exactly AT the threshold are kept") {
    // J = 3/5 = 0.6 exactly
    val docs: Seq[(Long, String)] = Seq(
      1L -> "a b c d",
      2L -> "a b c e")
    assert(run(docs, 0.6) === Set((1L, 2L, 3L, 5L)))
    assert(run(docs, 0.601) === Set.empty[(Long, Long, Long, Long)])
  }
}
