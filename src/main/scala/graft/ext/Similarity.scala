package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector column primitives over Array[Float] embeddings — pure
  * higher-order-function expressions (zip_with/aggregate), so they run
  * inside codegen with no UDF/boxing. Accumulation is in Double regardless
  * of the storage type.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pack `nbits` random-hyperplane sign bits into a long bucket id.
    * Hyperplane components are hash-derived (deterministic, uniform in
    * [-1,1]): component (j,d) = (xxhash64(seed, j*100003 + d) mod 2001 - 1000)/1000.
    */
  def hyperplaneSignature(vec: Column, nbits: Int): Column =
    hyperplaneSignatureSeeded(vec, nbits, lit(0))

  /** As hyperplaneSignature, with a Column seed selecting an independent
    * hyperplane family (for LSH OR-constructions).
    */
  def hyperplaneSignatureSeeded(vec: Column, nbits: Int, seed: Column): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    val bits = transform(sequence(lit(0), lit(nbits - 1)), j => {
      val proj = aggregate(
        zip_with(vec, dims, (v, d) =>
          v.cast(DoubleType) *
            ((pmod(xxhash64(seed * 1000003 + j * 100003 + d), lit(2001)) - 1000).cast(DoubleType) / 1000.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, 1L).otherwise(0L)
    })
    aggregate(bits, lit(0L), (acc, bit) => acc * 2 + bit)
  }
}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - bruteForceTopK: the exact baseline — broadcast the (small) query set,
  *    score every (row, query) pair in one codegen'd projection, take top-k
  *    per query with a rank window. Scales linearly in |data|×|queries|
  *    with NO shuffle of the data table (queries are broadcast; the only
  *    shuffle is the per-query top-k, keyed by query_id).
  *  - lshTopK: the scale path — hyperplane-LSH bucket join (IVF-style
  *    candidate pruning), exact re-rank within candidates. Recall is
  *    tunable via nbits (fewer bits → bigger buckets → higher recall).
  */
object Similarity {

  /** Exact top-k neighbors for each query row. `queries` should be small
    * (it is broadcast); typically a filtered slice of the same table.
    */
  def bruteForceTopK(data: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms precomputed ONCE per row/query, not once per (row, query) pair
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv__"),
      Vectors.norm(col(vecCol)).as("__qn__")))
    val scored = data
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__v__"),
        Vectors.norm(col(vecCol)).as("__n__"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", Vectors.dot(col("__v__"), col("__qv__")) / (col("__n__") * col("__qn__")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Approximate top-k: candidates = rows sharing the query's LSH bucket,
    * re-ranked exactly. A production IVF would probe multiple adjacent
    * buckets; here bucket granularity is the recall knob.
    */
  def lshTopK(data: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nbits: Int = 6): DataFrame = {
    val sig = Vectors.hyperplaneSignature(col(vecCol), nbits)
    val d = data.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v__"),
      Vectors.norm(col(vecCol)).as("__n__"), sig.as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv__"),
      Vectors.norm(col(vecCol)).as("__qn__"),
      Vectors.hyperplaneSignature(col(vecCol), nbits).as("bucket")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    d.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", Vectors.dot(col("__v__"), col("__qv__")) / (col("__n__") * col("__qn__")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }
}
