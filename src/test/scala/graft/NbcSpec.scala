package graft

import graft.ext.LangModel
import java.security.MessageDigest

/** LangModel.naiveBayes vs an exact local mirror (same hash split, same
  * counts, same micro-nat fixed point, same argmin tie-break), plus the
  * rounding-boundary-distance check that justifies the cross-engine
  * determinism claim (every -ln term and prior far from a .5 boundary).
  */
class NbcSpec extends SparkSpec {

  private def md5hex8(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString

  private def tok(s: String): Array[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Exact local mirror of naiveBayes at trainFraction=0.5. Returns
    * (doc -> (truth, pred, nll_micro), all raw fixed-point terms).
    */
  private def mirror(docs: Seq[(Long, String, String)])
      : (Map[Long, (String, String, Long)], Seq[Double]) = {
    val train = docs.filter { case (id, _, _) => md5hex8(id.toString) < "80000000" }
    val pri = train.groupBy(_._3).map { case (c, v) => c -> v.size.toLong }
    val n = train.size.toDouble
    val tw = train.flatMap { case (_, t, c) => tok(t).map(w => (c, w)) }
    val cwc = tw.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totc = tw.groupBy(_._1).map { case (c, v) => c -> v.size.toLong }
    val vsz = tw.map(_._2).distinct.size.toDouble
    var terms = List.empty[Double]
    val priorMicro = pri.map { case (c, nd) =>
      val raw = -math.log(nd.toDouble / n) * 1e6
      terms = raw :: terms
      c -> math.round(raw)
    }
    val out = docs.map { case (id, t, truth) =>
      val scores = pri.keys.toSeq.sorted.map { c =>
        val s = priorMicro(c) + tok(t).map { w =>
          val raw = -math.log((cwc.getOrElse((c, w), 0L).toDouble + 1.0) /
            (totc(c).toDouble + vsz)) * 1e6
          terms = raw :: terms
          math.round(raw) // half-up on non-negative == Spark round
        }.sum
        (s, c)
      }
      val (best, cls) = scores.minBy(identity)
      id -> (truth, cls, best)
    }.toMap
    (out, terms)
  }

  private def run(docs: Seq[(Long, String, String)])
      : Map[Long, (String, String, Long)] = {
    import spark.implicits._
    LangModel.naiveBayes(docs.toDF("doc_id", "text", "source"),
        "doc_id", "text", "source")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
  }

  test("equals the exact local mirror on the sf0.001 corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (want, terms) = mirror(docs)
    assert(run(docs) === want)
    // determinism claim: every fixed-point term sits far from a rounding
    // boundary relative to 1 ulp of ln (~1e-10 at this magnitude)
    val minBoundaryDist = terms.map(t => math.abs(t - math.floor(t) - 0.5)).min
    assert(minBoundaryDist > 1e-4,
      f"term within $minBoundaryDist%.2e of a .5 boundary — oracle at risk")
    // the classifier actually discriminates: not every doc gets one class
    assert(want.values.map(_._2).toSet.size > 1)
  }

  test("empty docs score prior-only; min-class tie-break is lexicographic") {
    // ids 6, 9 hash below 0x80000000 → train; 1 (empty) and 4 → eval
    val docs: Seq[(Long, String, String)] = Seq(
      (1L, "", "a"), (4L, "zz qq unseen", "b"),
      (6L, "zz qq zz", "a"), (9L, "qq rr", "b"))
    val got = run(docs)
    val (want, _) = mirror(docs)
    assert(got === want)
    // the empty doc's score is exactly the winning class's prior
    // (one train doc per class → prior ln(1/2) each)
    val pm = math.round(-math.log(0.5) * 1e6)
    assert(got(1L)._3 === pm)
    assert(got(1L)._2 === "a", "equal priors must tie-break to 'a'")
  }
}
