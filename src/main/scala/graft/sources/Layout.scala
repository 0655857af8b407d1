package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, shiftleft, shiftright}

/** Physical-layout control: bucketed/sorted table writes for shuffle-free
  * repeated joins and aggregations.
  *
  * At 100 TB the dominant recurring cost of a fact-to-fact equi-join
  * (lineitem ⋈ orders, events ⋈ sessions) is re-shuffling both sides on
  * every query. Bucketing pays that shuffle ONCE at write time: both
  * tables hash-partitioned into the same number of buckets on the join
  * key means every subsequent join/groupBy on that key is exchange-free —
  * the scan itself reports the hash partitioning to Catalyst
  * (`HashClusteredDistribution` satisfied by the bucketed relation), so
  * the planner drops the Exchange nodes entirely. Sort buckets by the key
  * too and the SortMergeJoin's per-partition sort disappears as well.
  *
  * This is the Spark-native equivalent of the co-located table layouts in
  * distributed warehouses; with `spark.sql.sources.v2.bucketing` it
  * extends to storage-partitioned joins on v2 sources.
  */
object Layout {

  /** Write `df` as a managed parquet table bucketed (and optionally
    * sorted) on `bucketCols`. Joins between tables written with the SAME
    * bucket count and keys plan without a shuffle on either side.
    */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCols: Seq[String], buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Hive-style partitioned parquet layout (`path/col=value/...`): a
    * filter on a partition column prunes whole directories at PLANNING
    * time — the 100 TB norm for date/source-keyed facts, where a day's
    * query must touch a day's files, not the table. Verify with
    * [[prunedPartitions]] / the scan's `PartitionFilters`.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)

  /** (selected, total) partition-directory counts for `df`'s scan after
    * pushdown — machine-checkable partition pruning.
    */
  def prunedPartitions(df: DataFrame): (Long, Long) = {
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    require(scans.nonEmpty, "no file scan in plan")
    val s = scans.head
    (s.selectedPartitions.partitionCount.toLong,
      s.relation.location.listFiles(Nil, Nil).length.toLong)
  }

  /** Morton (Z-order) interleave of two non-negative int columns, `bits`
    * bits each (x on even bit positions, y on odd): points close in BOTH
    * dimensions get close z-values, so sorting by z gives every parquet
    * row group a TIGHT min/max envelope in both x and y — the standard
    * multi-dimensional data-clustering key (Delta/Iceberg OPTIMIZE
    * ZORDER) expressed as a plain codegen'd column. Inputs are masked to
    * `bits` bits (callers bucket/normalize wider domains first).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "zValue: bits in 1..31")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(mask)
    val ym = y.cast("long").bitwiseAND(mask)
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-ordered parquet write: range-partition into `files` output files by
    * the interleaved key and sort within each, so a selective predicate on
    * EITHER dimension prunes row groups via parquet min/max stats — where
    * a single-column sort only ever prunes its own column. Verified by
    * ZOrderSpec against the scan's numOutputRows metric.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    files: Int, bits: Int = 16): Unit =
    df.withColumn("__z__", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__z__"))
      .sortWithinPartitions("__z__")
      .drop("__z__")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** True iff the executed plan of `df` contains no SHUFFLE exchange —
    * the machine-checkable definition of "this join/agg is co-located".
    * Broadcast exchanges don't count: they move the small side, not the
    * data table.
    */
  def isExchangeFree(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.isEmpty

  /** Clustering-quality metric for a directory's sort key: the average
    * number of files whose [min, max] key range OVERLAPS each file's
    * range (a file always overlaps itself, so perfect clustering → 1.0
    * and no clustering → ≈ fileCount). This is the number a maintenance
    * job watches to decide WHEN `compact`/`writeZOrdered` pays for
    * itself: scan-time file pruning eliminates a fraction ≈ 1 −
    * depth/files of the table for a point predicate.
    */
  def clusteringDepth(spark: SparkSession, path: String, keyCol: String): Double = {
    val files = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    if (files.length <= 1) return files.length.toDouble
    val ranges = files.flatMap { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(org.apache.spark.sql.functions.min(col(keyCol)).cast("double"),
          org.apache.spark.sql.functions.max(col(keyCol)).cast("double"))
        .head()
      // zero-row files (streaming/compaction writers produce them) have
      // null min/max — they prune against every predicate, so skip them
      if (r.isNullAt(0) || r.isNullAt(1)) None else Some((r.getDouble(0), r.getDouble(1)))
    }
    if (ranges.isEmpty) return 0.0
    val overlaps = ranges.map { case (lo, hi) =>
      ranges.count { case (lo2, hi2) => lo2 <= hi && lo <= hi2 }
    }
    overlaps.sum.toDouble / ranges.length
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈bytes / targetBytes⌉ files, optionally re-clustered on `sortCols`.
    *
    * The operational problem this solves at 100 TB: streaming /
    * incremental writers produce thousands of KB-sized files per
    * partition, and every downstream scan then pays one task + one footer
    * read + one open per file (plus NameNode/object-store pressure).
    * Compaction is the standard maintenance op (Delta OPTIMIZE / Iceberg
    * rewrite_data_files re-expressed on plain parquet).
    *
    * With `sortCols` the rewrite is `repartitionByRange + sort` — files
    * then carry DISJOINT key ranges, so parquet min/max pruning works
    * across files, not just within row groups. Without, a plain
    * round-robin repartition balances bytes.
    *
    * Returns (filesBefore, filesAfter). Writes to `outPath` (never
    * in-place: a failed in-place rewrite loses data; callers swap
    * directories atomically at the catalog layer).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long, sortCols: Seq[String] = Nil): (Long, Long) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val in = new java.io.File(inPath)
    val parts = Option(in.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val rewritten =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nOut)
    rewritten.write.mode(SaveMode.Overwrite).parquet(outPath)
    val after = Option(new java.io.File(outPath).listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet")).toLong
    (parts.length.toLong, after)
  }
}
