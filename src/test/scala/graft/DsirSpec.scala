package graft

import org.apache.spark.sql.functions.col
import java.security.MessageDigest

/** Sampling.dsirSelect vs an exact local mirror (same tokenization, same
  * md5 buckets, same smoothing, same fixed-point log-ratios, same
  * rank/tie-break), plus the rounding-boundary-distance check: log-ratio
  * terms are SIGNED, and away from .5 boundaries nearest-integer
  * rounding agrees across Spark (BigDecimal HALF_UP), DuckDB (half away
  * from zero), and the mirror's math.round — the margin assert is what
  * makes that argument rigorous.
  */
class DsirSpec extends SparkSpec {

  private def md5hex8(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString

  private def tok(s: String): Array[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty)

  test("equals the exact local mirror on the sf0.001 corpus, margins safe") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val B = 512
    val K = 20
    def gramsOf(t: String): Seq[String] = {
      val w = tok(t)
      w.toSeq ++ w.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    def bucket(g: String): Long = java.lang.Long.parseLong(md5hex8(g), 16) % B
    val grams = docs.flatMap { case (id, t, src) =>
      gramsOf(t).map(g => (id, src == "src1", bucket(g)))
    }
    val cr = grams.groupBy(_._3).map { case (b, v) => b -> v.size.toLong }
    val ct = grams.filter(_._2).groupBy(_._3).map { case (b, v) => b -> v.size.toLong }
    val tr = grams.size.toDouble
    val tt = grams.count(_._2).toDouble
    var terms = List.empty[Double]
    val lr = cr.map { case (b, crv) =>
      val ctv = ct.getOrElse(b, 0L)
      val raw = math.log(((ctv + 1.0) / (tt + B.toDouble)) /
        ((crv + 1.0) / (tr + B.toDouble))) * 1e6
      terms = raw :: terms
      b -> math.round(raw)
    }
    // margin FIRST: only far from .5 boundaries do HALF_UP (Spark),
    // half-away-from-zero (DuckDB), and math.round (mirror) agree on
    // signed values
    val minDist = terms.map(t => math.abs(t - math.floor(t) - 0.5)).min
    assert(minDist > 1e-4, f"log-ratio within $minDist%.2e of a .5 boundary")
    val w = grams.groupBy(_._1).map { case (id, gs) =>
      id -> gs.map(g => lr(g._3)).sum
    }
    val want = w.toSeq.sortBy { case (id, wt) => (-wt, id) }.take(K)
      .zipWithIndex.map { case ((id, wt), i) => (i + 1L, id, wt) }
    import spark.implicits._
    val got = graft.ext.Sampling.dsirSelect(
        docs.toDF("doc_id", "text", "source"), "doc_id", "text",
        col("source") === "src1", buckets = B, k = K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // the target domain should rank its own docs high: at least one
    // selected doc is from src1 (sanity that the signal is real)
    val srcOf = docs.map(d => d._1 -> d._3).toMap
    assert(got.exists(g => srcOf(g._2) == "src1"))
  }
}
