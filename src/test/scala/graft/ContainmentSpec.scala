package graft

import graft.ext.SimJoin

/** SimJoin.containmentJoin vs brute force: the prefix-filtered directed
  * containment join must equal the quadratic definition exactly —
  * including the full-containment quote case Jaccard misses and the
  * asymmetry (a⊂b does not imply b⊂a).
  */
class ContainmentSpec extends SparkSpec {

  private def brute(docs: Seq[(Long, String)], num: Int, den: Int)
      : Set[(Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if ia != ib
      inter = (sa & sb).size.toLong
      if inter * den >= sa.size.toLong * num
    } yield (ia, ib, inter)).toSet
  }

  private def run(docs: Seq[(Long, String)], num: Int, den: Int)
      : Set[(Long, Long, Long)] = {
    import spark.implicits._
    SimJoin.containmentJoin(docs.toDF("doc_id", "text"), "doc_id", "text", num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
  }

  test("planted quote: full containment one way, not the other") {
    val quote = "alpha beta gamma delta epsilon"
    val host = s"$quote zeta eta theta iota kappa lambda mu nu xi omicron " +
      "pi rho sigma tau upsilon phi chi psi omega one two three four five"
    val docs = Seq(1L -> quote, 2L -> host, 3L -> "unrelated words entirely here")
    val got = run(docs, 4, 5)
    assert(got.contains((1L, 2L, 5L)), "the quote is fully inside the host")
    assert(!got.exists(p => p._1 == 2L && p._2 == 1L),
      "the host is NOT contained in the quote (asymmetry)")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("equals brute force on the sf0.001 corpus at t=4/5 and t=1/2") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    for ((num, den) <- Seq((4, 5), (1, 2))) {
      assert(run(docs, num, den) == brute(docs, num, den), s"t=$num/$den")
    }
  }

  test("probePred restricts the probe side only, not the index side") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = SimJoin.containmentJoin(docs.toDF("doc_id", "text"),
        "doc_id", "text", 4, 5, probePred = col("id") % 10 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val want = brute(docs, 4, 5).filter(_._1 % 10 == 0)
    assert(got == want)
    assert(got.exists(_._2 % 10 != 0), "index side must stay unrestricted")
  }
}
