package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-ANN index: the missing piece between "train an index in
  * one job" ([[IvfIndex]]) and how a 100 TB corpus actually serves ANN —
  * the index is built ONCE, written to storage laid out for probing, and
  * every later query (or ingest batch) re-opens it without retraining.
  *
  * On-disk layout (`path/`):
  *   - `cells/cell=N/…parquet` — the inverted lists, Hive-partitioned by
  *     cell id. Partitioning by cell is the whole point: a probe touches
  *     `nProbe` cells per query, and the `cell IN (…)` filter prunes the
  *     untouched cell DIRECTORIES at planning time, so a query against a
  *     100 TB index reads only its probed lists (verify with
  *     [[graft.sources.Layout.prunedPartitions]] — AnnIndexSpec does).
  *   - `centroids/…parquet` — the coarse quantizer (k × dim doubles),
  *     tiny; re-opened onto the driver and broadcast exactly like a
  *     freshly trained one.
  *
  * Incremental ingest ([[append]]) assigns NEW vectors under the FROZEN
  * persisted centroids and appends only their cells' directories — no
  * retrain, no rewrite of existing lists (the FAISS `add`-after-`train`
  * contract; cell balance degrades as the distribution drifts, which is
  * when a maintenance job retrains — see SCALE.md).
  *
  * Reference scope: the reference engine has no ANN surface at all
  * (SURVEY §2); this extends the LLM-pipeline brief's "IVF … as the
  * scale path" to the persisted/incremental form a real corpus needs.
  */
object AnnIndex {

  /** Write `(id, v, cell)` rows (the shape [[IvfIndex.assign]] emits) and
    * their centroids as a persisted index rooted at `path`.
    */
  def write(assigned: DataFrame, centroids: Seq[(Int, Array[Double])],
            path: String): Unit = {
    val spark = assigned.sparkSession
    assigned.select(col("id"), col("v"), col("cell").cast("int").as("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$path/cells")
    // snapshot manifest = the probe-visible commit point for the lists
    graft.sources.Snapshots.bootstrap(spark, s"$path/cells")
    import spark.implicits._
    centroids.toDF("cell", "v")
      .coalesce(1) // k × dim doubles — a few MB even at k = 4096
      .write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
  }

  /** Re-open a persisted index: (inverted lists, centroids). The lists
    * DataFrame is a plain partitioned scan — filters on `cell` prune
    * directories at planning time.
    */
  def open(spark: SparkSession, path: String): (DataFrame, Seq[(Int, Array[Double])]) = {
    val cells = graft.sources.Snapshots.read(spark, s"$path/cells")
      .getOrElse(sys.error(s"AnnIndex: no live inverted lists at $path/cells"))
      .select(col("id"), col("v"), col("cell").cast("int").as("cell"))
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cell").cast("int"), col("v"))
      .collect() // k rows — the coarse quantizer is driver-resident by design
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    (cells, cents)
  }

  /** Incremental ingest: assign `delta` under the index's FROZEN
    * centroids and append to its cell directories. Append-mode parquet
    * only adds files under the touched `cell=N/` dirs — existing lists
    * are never rewritten, so ingest cost is O(delta), not O(index).
    */
  def append(delta: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val spark = delta.sparkSession
    val (_, cents) = open(spark, path)
    graft.sources.Snapshots.appendCommit(spark, s"$path/cells") {
      IvfIndex.assign(delta, idCol, vecCol, cents)
        .select(col("id"), col("v"), col("cell").cast("int").as("cell"))
        .write.mode(SaveMode.Append).partitionBy("cell")
        .parquet(s"$path/cells")
    }
  }

  /** Persist a bounded-degree neighbor graph (the [[GraphAnn]] index) as
    * src-range-partitioned, src-sorted parquet: every file then carries a
    * DISJOINT src range with tight min/max stats, so the beam search's
    * per-round adjacency lookups prune to the files holding the beam's
    * nodes — the same "read only what you probe" layout discipline as the
    * IVF cell directories, expressed through row-group pruning instead of
    * partition directories (a graph has no natural low-cardinality
    * partition key).
    */
  def writeGraph(graph: DataFrame, path: String, files: Int = 8): Unit =
    graph.repartitionByRange(files, col("src"))
      .sortWithinPartitions("src", "dst")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/edges")

  def openGraph(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/edges")

  /** Maintenance: compact ONE cell's inverted list — O(cell), not
    * O(index). Incremental [[append]] batches accumulate a file per batch
    * per touched cell; at ingest-heavy scale a probe then pays a task +
    * footer read + open per tiny file. This rewrites the cell's live
    * files to a bounded count and commits the swap through the snapshot
    * manifest ([[graft.sources.Snapshots]]): new files land first
    * (invisible to probes), then one atomic manifest commit makes them
    * live — concurrent probes resolve either the old or the new file set,
    * never a partial one, on any Hadoop filesystem (HDFS/S3A/local).
    * Single maintenance writer by contract. Contents are bit-identical —
    * AnnIndexSpec asserts probe equality.
    */
  def compactCell(spark: SparkSession, path: String, cell: Int,
                  targetBytes: Long = 128L << 20): (Long, Long) =
    graft.sources.Snapshots.compactCommit(spark, s"$path/cells",
      rel => rel.startsWith(s"cell=$cell/"), targetBytes,
      partitionBy = Seq("cell"))

  /** Top-k cosine probe against a persisted index, reading ONLY the
    * probed cells: the per-query probe cells are computed driver-side
    * (|queries| × nProbe ints — the probe batch is the bounded small
    * side by contract, same bound as the broadcast inside
    * [[IvfIndex.topK]]), and their union becomes a static `cell IN (…)`
    * predicate that prunes unprobed partition directories at planning
    * time. Results are identical to [[IvfIndex.topK]] over the full
    * index — the filter only removes rows the cell-equijoin would drop.
    */
  def probeTopK(spark: SparkSession, path: String, queries: DataFrame,
                idCol: String, vecCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    val (cells, cents) = open(spark, path)
    graft.functions.VectorExprs.register(spark)
    val probedCells = queries
      .select(explode(graft.functions.VectorExprs.nearestCells(
        col(vecCol).cast("array<double>"), cents, nProbe)).as("cell"))
      .distinct().collect().map(_.getInt(0)).sorted
    val pruned = cells.filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
    IvfIndex.topK(pruned, queries, idCol, vecCol, cents, k, nProbe)
  }
}
