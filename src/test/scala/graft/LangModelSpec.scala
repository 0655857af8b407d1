package graft

import graft.ext.LangModel
import java.security.MessageDigest

/** LangModel.bigramNll vs an exact local mirror (same split, same counts,
  * same fixed-point terms), plus the rounding-boundary-distance check that
  * justifies the cross-engine determinism claim.
  */
class LangModelSpec extends SparkSpec {

  private def md5hex8(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString

  private def tok(s: String): Array[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Exact local mirror of bigramNll at k=0.5, trainFraction=0.5. */
  private def mirror(docs: Seq[(Long, String)])
      : (Map[Long, (Long, Long)], Seq[Double]) = {
    val train = docs.filter { case (id, _) => md5hex8(id.toString) < "80000000" }
    def bigrams(t: Array[String]) = t.sliding(2).filter(_.length == 2)
      .map(a => (a(0), a(1))).toSeq
    val tb = train.flatMap { case (_, s) => bigrams(tok(s)) }
    val c12 = tb.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
    val c1 = tb.groupBy(_._1).map { case (kk, v) => kk -> v.size.toLong }
    val v = math.max(train.flatMap { case (_, s) => tok(s) }.distinct.size.toDouble, 1.0)
    var terms = List.empty[Double]
    val out = docs.map { case (id, s) =>
      val bgs = bigrams(tok(s))
      val ms = bgs.map { bg =>
        val p = (c12.getOrElse(bg, 0L) + 0.5) / (c1.getOrElse(bg._1, 0L) + 0.5 * v)
        val term = -math.log(p) * 1e6
        terms = term :: terms
        math.round(term) // half-up on non-negative doubles == Spark round
      }
      id -> (bgs.size.toLong, ms.sum)
    }.toMap
    (out, terms)
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    LangModel.bigramNll(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("equals the exact local mirror on the sf0.001 corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (want, terms) = mirror(docs)
    assert(run(docs) === want)
    // determinism claim: every fixed-point term sits far from a rounding
    // boundary relative to 1 ulp of ln (~1e-10 at this magnitude)
    val minBoundaryDist = terms.map(t => math.abs(t - math.floor(t) - 0.5)).min
    assert(minBoundaryDist > 1e-4,
      f"term within $minBoundaryDist%.2e of a .5 boundary — oracle at risk")
    // sanity: the model separates docs (scores vary)
    assert(want.values.map(_._2).toSet.size > 10)
  }

  test("collocations: exact local PMI mirror, positive-PMI filter, boundary distance") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // local mirror
    val bgs = docs.flatMap { case (_, t) =>
      val w = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (w.length >= 2) w.sliding(2).map(p => (p(0), p(1))).toSeq else Nil
    }
    val c12 = bgs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = bgs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val c2 = bgs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val nb = bgs.size.toLong
    val cands = c12.filter { case ((a, b), c) =>
      c >= 5 && c * nb > c1(a) * c2(b) }
    val scored = cands.map { case ((a, b), c) =>
      val raw = math.log((c * nb).toDouble / (c1(a) * c2(b)).toDouble) * 1e6
      (a, b, c, math.round(raw), raw)
    }.toSeq
    val want = scored.sortBy(t => (-t._4, t._1, t._2)).take(50).map(t => (t._1, t._2, t._3, t._4))

    val got = graft.ext.LangModel.collocations(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text", 5, 50)
      .select("w1", "w2", "c12", "pmi_micro")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // every emitted score is PMI > 0 and far from a rounding boundary
    assert(want.forall(_._4 >= 0))
    val minDist = scored.map(t => math.abs(t._5 - math.floor(t._5) - 0.5)).min
    assert(minDist > 1e-4, f"PMI term within $minDist%.2e of a .5 boundary")
  }

  test("short and empty docs score (0, 0); unseen-history docs still score") {
    // ids 6 and 9 hash below 0x80000000 → train split; 1, 2, 4 → eval
    val docs: Seq[(Long, String)] = Seq(
      1L -> "", 2L -> "word",
      4L -> "completely unseen tokens here",
      6L -> "zz qq zz qq zz", 9L -> "zz qq rr")
    val got = run(docs)
    val (want, _) = mirror(docs)
    assert(got === want)
    assert(got(1L) === ((0L, 0L)) && got(2L) === ((0L, 0L)))
    // a doc of entirely unseen tokens pays the uniform 1/V penalty per bigram
    assert(got(4L)._1 === 3L && got(4L)._2 > 0L)
  }
}
