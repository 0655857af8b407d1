package graft.ext

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-bound per-row kernels (minhash/simhash/
  * winnow/hyperplane signatures).
  *
  * Spark sizes scan partitions by BYTES (`spark.sql.files.maxPartitionBytes`)
  * — correct for IO-bound scans, wrong for compute-bound kernels: a 500 KB
  * parquet of 50k documents arrives as ONE partition, so a signature pass
  * that costs ~10⁴ hash ops per row runs on one core of the whole cluster.
  * The guard repartitions ONLY when the scan's parallelism is below the
  * cluster's (`defaultParallelism`); inputs that already have natural
  * parallelism (any real 100 TB table: thousands of files) pass through
  * untouched, so the extra shuffle exists exactly when it is cheap and
  * never when it would be the bottleneck.
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
