package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al., arXiv:2303.09540): SEMANTIC deduplication —
  * remove documents whose embeddings are near-identical even when their
  * text differs (translations, rewrites, templated paraphrases that
  * MinHash/SimHash cannot see). The reference pipeline is k-means over
  * the embedding space, then pairwise cosine inside each cluster, then
  * keep one representative per near-dup group.
  *
  * Scale shape (100 TB):
  *  - the O(n²) cosine comparison is confined to k-means cells — the
  *    trained coarse quantizer (IvfIndex, FAISS IVF shape) is the same
  *    data-adaptive partitioner the ANN index already uses, so cells are
  *    balanced where hyperplane LSH buckets collapse;
  *  - cells larger than `maxCell` degrade to spanning-star pairs against
  *    the cell's min-id (Dedup.bucketPairs) with observed-metrics drop
  *    logging — the cap that keeps a degenerate corpus (all embeddings
  *    equal) linear instead of quadratic;
  *  - near-dup groups close transitively via distributed connected
  *    components (Graph.clusterDedup) — a~b~c keeps exactly one doc even
  *    without a direct (a,c) edge;
  *  - vectors shuffle ONCE (cell assignment); candidate pairs carry ids
  *    only and re-join vectors for the bounded candidate set.
  *
  * Fully DuckDB-replayable: fixed-point Lloyd training (IvfIndex.Grid)
  * plus fixed-order float scoring let the driver hash-match the whole
  * pipeline with unrolled iterations; SemanticSpec carries the
  * quantitative ground truth too (kept set == exact all-pairs transitive
  * dedup at the same threshold on the test corpus).
  */
object Semantic {

  /** Cosine-similar pairs (id_a, id_b, cos) found within k-means cells.
    * `cells` should make avg occupancy n/k a few hundred; `maxCell` caps
    * the within-cell join; `nAssign` soft-assigns each vector to its
    * nearest cells for candidate generation (recall vs cost dial).
    */
  def semanticPairs(data: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, cells: Int, maxCell: Int = 2000,
                    nAssign: Int = 2, iters: Int = 2,
                    trainFraction: Double = 1.0): DataFrame = {
    val centroids = IvfIndex.train(data, idCol, vecCol, cells, iters, trainFraction)
    graft.functions.VectorExprs.register(data.sparkSession)
    // consumed three times (assignment + both pair-side rejoins): persist,
    // released by the caller's clearCache (Verify/Bench) or session end
    val vecs = Par.fanOut(data)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // soft assignment: each vector lands in its nAssign nearest cells for
    // candidate generation — pairs split across a cell boundary are
    // recovered when the probed cell sets overlap (IVF's nProbe dial)
    val assigned = vecs
      .select(col("id"), explode(graft.functions.VectorExprs.nearestCells(
        col("v"), centroids, nAssign)).as("cell"))
    Dedup.bucketPairs(assigned, Seq("cell"), maxCell, "semdedup")
      .distinct() // a pair can collide in up to nAssign shared cells
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cos", Vectors.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** The kept rows: one representative (min id) per transitive semantic
    * near-dup group, every other row dropped.
    */
  def semDedup(data: DataFrame, idCol: String, vecCol: String,
               threshold: Double, cells: Int, maxCell: Int = 2000): DataFrame = {
    val pairs = semanticPairs(data, idCol, vecCol, threshold, cells, maxCell)
    Graph.clusterDedup(data, idCol, pairs)
  }
}
