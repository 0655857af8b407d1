package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed PCA the covariance-aggregation way: ONE pass over the
  * corpus accumulates the d×d gram matrix + means (graft.functions.GramAgg
  * — integer milli-quantized, so the distributed half is engine-EXACT and
  * DuckDB-oracle-able), then the d×d eigenproblem — a few KB — is solved
  * on the driver with cyclic Jacobi rotations. This is the standard
  * big-data PCA split: the data-sized work is a mergeable aggregate, the
  * O(d³) part never touches the cluster (same driver-residency rule as
  * the IVF coarse quantizer).
  */
object Pca {

  /** Milli-quantized gram rows for the oracle and for [[topEigen]]:
    * (i, j, s) with s = Σ qᵢ·qⱼ for 0 ≤ i ≤ j < d,
    * (i, -1, Σ qᵢ) linear sums, and (-1, -1, n) — q = ⌊x·1000 + 0.5⌋.
    */
  def gramMicro(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val q = transform(col(vecCol),
      x => floor(x.cast(DoubleType) * 1000 + 0.5).cast(LongType))
    val flat = Par.fanOut(df).select(q.as("q"))
      .agg(graft.functions.GramAgg.gram(col("q"), dim).as("g"))
    // flat position → (i, j) labels, driver-built (d²/2 rows of metadata)
    val spark = df.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    val labels = ((0 until tri).map { p =>
      val (i, j) = graft.functions.GramAgg.unflatten(p, dim)
      (p, i.toLong, j.toLong)
    } ++ (0 until dim).map(i => (tri + i, i.toLong, -1L)) :+
      ((tri + dim, -1L, -1L))).toDF("pos", "i", "j")
    flat.select(posexplode(col("g")).as(Seq("pos", "s")))
      .join(broadcast(labels), "pos")
      .select(col("i"), col("j"), col("s"))
  }

  /** Top-k eigenvalues (descending) and eigenvectors of the covariance
    * matrix reconstructed from [[gramMicro]] rows — cyclic Jacobi on the
    * driver; deterministic for a fixed sweep count. Eigenvector sign is
    * normalized (largest-|component| positive) since sign is arbitrary.
    */
  def topEigen(gramRows: Array[(Long, Long, Long)], dim: Int, k: Int,
               sweeps: Int = 12): Seq[(Double, Array[Double])] = {
    val tri = Array.ofDim[Double](dim, dim)
    var n = 0.0
    val lin = new Array[Double](dim)
    gramRows.foreach { case (i, j, s) =>
      if (i < 0) n = s.toDouble
      else if (j < 0) lin(i.toInt) = s.toDouble
      else { tri(i.toInt)(j.toInt) = s.toDouble; tri(j.toInt)(i.toInt) = s.toDouble }
    }
    require(n > 0, "empty gram")
    // covariance in milli-units²: C = S/n − μμᵀ
    val a = Array.tabulate(dim, dim)((i, j) => tri(i)(j) / n - lin(i) / n * (lin(j) / n))
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps; p <- 0 until dim - 1; q <- (p + 1) until dim) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-12) {
        val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
        // sign(0) must be 1 (θ=0 is the 45° rotation), not signum's 0
        val sgn = if (theta < 0) -1.0 else 1.0
        val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1))
        val c = 1 / math.sqrt(t * t + 1)
        val s = t * c
        for (i <- 0 until dim) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq; a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until dim) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi; a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until dim) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq; v(i)(q) = s * vip + c * viq
        }
      }
    }
    (0 until dim).map(i => (a(i)(i), Array.tabulate(dim)(r => v(r)(i))))
      .sortBy(-_._1).take(k)
      .map { case (ev, vec) =>
        val m = vec.indices.maxBy(i => math.abs(vec(i)))
        (ev, if (vec(m) < 0) vec.map(-_) else vec)
      }
  }
}
