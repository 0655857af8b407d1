package graft

import graft.ext.Pca
import graft.functions.GramAgg

/** Gram aggregation exactness (vs a local integer mirror) and the Jacobi
  * eigensolver (known matrix + spectral properties on the real corpus).
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("unflatten inverts the upper-triangle layout") {
    val d = 7
    var p = 0
    for (i <- 0 until d; j <- i until d) {
      assert(GramAgg.unflatten(p, d) === ((i, j)), s"pos $p")
      p += 1
    }
  }

  test("gramMicro equals the exact local integer mirror on the corpus") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dim = 64
    val vecs = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong))
    val got = Pca.gramMicro(emb, "embedding", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (i <- 0 until dim; j <- i until dim) {
      val want = vecs.map(q => q(i) * q(j)).sum
      assert(got((i.toLong, j.toLong)) === want, s"S[$i][$j]")
    }
    for (i <- 0 until dim)
      assert(got((i.toLong, -1L)) === vecs.map(_(i)).sum, s"lin[$i]")
    assert(got((-1L, -1L)) === vecs.length.toLong)
  }

  test("Jacobi eigensolver: known matrix and spectral properties") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1
    val rows = Array((0L, 0L, 2L), (0L, 1L, 1L), (1L, 1L, 2L),
      (0L, -1L, 0L), (1L, -1L, 0L), (-1L, -1L, 1L))
    val eig = Pca.topEigen(rows, 2, 2)
    assert(math.abs(eig(0)._1 - 3.0) < 1e-9 && math.abs(eig(1)._1 - 1.0) < 1e-9)

    // real corpus: eigen of the 64-dim covariance — trace preserved,
    // eigenvalues descending and non-negative, Av = λv residual tiny
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val gr = Pca.gramMicro(emb, "embedding", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = Pca.topEigen(gr, 64, 64)
    val n = gr.find(t => t._1 == -1L).get._3.toDouble
    val lin = (0 until 64).map(i => gr.find(t => t._1 == i && t._2 == -1L).get._3.toDouble)
    def cov(i: Int, j: Int): Double = {
      val (a, b) = (math.min(i, j), math.max(i, j))
      gr.find(t => t._1 == a && t._2 == b).get._3 / n - lin(i) / n * (lin(j) / n)
    }
    val trace = (0 until 64).map(i => cov(i, i)).sum
    assert(math.abs(all.map(_._1).sum - trace) / trace < 1e-9, "trace preserved")
    assert(all.map(_._1).sliding(2).forall(p => p.head >= p.last - 1e-12), "descending")
    assert(all.last._1 > -1e-6, "PSD within tolerance")
    val (ev, vec) = all.head
    val av = (0 until 64).map(i => (0 until 64).map(j => cov(i, j) * vec(j)).sum)
    val resid = math.sqrt((0 until 64).map(i => math.pow(av(i) - ev * vec(i), 2)).sum)
    assert(resid < 1e-6 * math.abs(ev), s"Av=λv residual $resid for λ=$ev")
  }
}
