package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez 1985, the 2-approximation;
  * the selection backbone of modern data-curation work — e.g. active
  * learning coresets, Sener & Savarese ICLR 2018). Picks k maximally
  * spread rows: each round adds the point FARTHEST from its nearest
  * already-selected center — a diverse subset for training-data budgets,
  * the complement of SemDeDup's "drop the near-identical".
  *
  * Scale shape (100 TB): k passes over the corpus, each ONE codegen'd
  * map with the ≤k selected centers riding as literals (a few KB
  * broadcast with the closure) + a 1-row argmax collect — no shuffle of
  * vectors, ever; ‖v‖² is precomputed once. The sequential k loop is the
  * algorithm (each choice depends on all previous), exactly like BPE's
  * merge loop.
  *
  * Deterministic and oracle-replayable: seed = min id; d²(v,c) =
  * (‖v‖² − 2⟨v,c⟩) + ‖c‖² in fixed double order (‖c‖² is a driver-folded
  * literal equal to DuckDB's list_dot_product); nearest-center is an
  * exact MIN comparison (least ≡ SQL min — no accumulation); argmax ties
  * break on (d desc, id asc).
  */
object Coreset {

  /** Select `k` rows; returns (sel_rank, id, dist) where dist is the
    * squared L2 distance to the nearest earlier-selected center at
    * selection time (0.0 for the seed).
    */
  def kCenter(data: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = data.sparkSession
    graft.functions.VectorExprs.register(spark)
    val src = data
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("vv", graft.functions.VectorExprs.dot(col("v"), col("v")))
      .localCheckpoint() // k argmax passes re-read this — scan the source once
    val seedRows = src.orderBy("id").limit(1).collect()
    require(seedRows.nonEmpty, "kCenter: input DataFrame is empty")
    val seed = seedRows(0)
    val selected = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)](
      (1, seed.getLong(0), 0.0))
    val centers = scala.collection.mutable.ArrayBuffer[Array[Double]](
      seed.getSeq[Double](1).toArray)
    for (rank <- 2 to k) {
      val dists = centers.map { c =>
        val c2 = { var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s }
        (col("vv") - lit(2.0) * graft.functions.VectorExprs.dot(col("v"), lit(c))) + lit(c2)
      }.toSeq
      val dmin = if (dists.size == 1) dists.head else least(dists: _*)
      val far = src
        .where(!col("id").isInCollection(selected.map(_._2)))
        .select(col("id"), col("v"), dmin.as("d"))
        .orderBy(desc("d"), asc("id"))
        .limit(1).collect()
      if (far.nonEmpty) {
        selected += ((rank, far(0).getLong(0), far(0).getDouble(2)))
        centers += far(0).getSeq[Double](1).toArray
      }
    }
    import spark.implicits._
    selected.toSeq.toDF("sel_rank", "id", "dist")
  }
}
