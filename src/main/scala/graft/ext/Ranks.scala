package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank machinery without single-partition sorts — the
  * SCALE.md §8b "range-partitioned ranks + offset scalars" pattern as a
  * reusable operator (ev_rfm and Skyline inline the same idea).
  */
object Ranks {

  /** Exact global per-group rank (row_number over a total order) as two
    * columns `out` and `<out>_n` (the group size): the frame is range-
    * partitioned on (group ++ sort) keys, ranked within (group,
    * partition), and lifted to exact global per-group ranks with
    * |groups|·partitions driver-collected offset scalars — never a
    * per-group single-partition sort (a window partitioned by a LOW-
    * cardinality key sorts each group's whole extent on one core).
    * `sortCols` must include a unique tie-break so the order is total
    * (ties may otherwise straddle range boundaries).
    *
    * The checkpoint after the range exchange is load-bearing: range
    * boundaries are sample-seeded per execution, so the offsets collect
    * and the ranked run must read the SAME materialized partitioning.
    *
    * For HIGH-cardinality group keys use a plain partitioned window —
    * it is already parallel; this helper's offsets would not fit the
    * driver.
    */
  def groupedRank(df: DataFrame, groupCol: String, sortCols: Seq[Column],
                  out: String, partitions: Int = 32): DataFrame = {
    val rangeCols = col(groupCol) +: sortCols
    val ranged = df.repartitionByRange(partitions, rangeCols: _*)
      .withColumn("__pid__", spark_partition_id().cast("long"))
      .localCheckpoint(true)
    val w = Window.partitionBy(col(groupCol), col("__pid__")).orderBy(sortCols: _*)
    val local = ranged.withColumn("__rn__", row_number().over(w).cast("long"))
    val cnts = ranged.groupBy(col(groupCol).as("__g__"), col("__pid__"))
      .agg(count(lit(1)).as("__c__"))
      .collect().map(r => (r.get(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val offRows = cnts.toSeq.flatMap { case (g, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (_, pid, c) =>
        val off = acc; acc += c; (g, pid, off, 0L)
      }.map { case (gg, pid, off, _) => (gg, pid, off, acc) } // acc = group total
    }
    val sess = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__g__",
        df.schema(groupCol).dataType),
      org.apache.spark.sql.types.StructField("__pid__",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__off__",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(out + "_n",
        org.apache.spark.sql.types.LongType)))
    val offDf = sess.createDataFrame(
      sess.sparkContext.parallelize(offRows.map(t =>
        org.apache.spark.sql.Row(t._1, t._2, t._3, t._4)), 1), schema)
    local
      .join(broadcast(offDf),
        col(groupCol) <=> col("__g__") && local("__pid__") === offDf("__pid__"))
      .withColumn(out, col("__rn__") + col("__off__"))
      .drop("__g__", "__pid__", "__rn__", "__off__")
  }

  /** Exact per-group cumulative sum of `valueCol` over a total order,
    * with the same decomposition as groupedRank: partition-local running
    * sums plus per-(group, partition) carry scalars (the prefix sums of
    * earlier partitions' totals). A cumulative window partitioned by a
    * low-cardinality key would otherwise sort each group's whole extent
    * on one core. Same contract as groupedRank.
    */
  def groupedRunningSum(df: DataFrame, groupCol: String, sortCols: Seq[Column],
                        valueCol: String, out: String,
                        partitions: Int = 32): DataFrame = {
    val rangeCols = col(groupCol) +: sortCols
    val ranged = df.repartitionByRange(partitions, rangeCols: _*)
      .withColumn("__pid__", spark_partition_id().cast("long"))
      .localCheckpoint(true)
    val w = Window.partitionBy(col(groupCol), col("__pid__")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = ranged.withColumn("__ls__", sum(col(valueCol)).over(w))
    val sums = ranged.groupBy(col(groupCol).as("__g__"), col("__pid__"))
      .agg(sum(col(valueCol)).as("__s__"))
      .collect().map(r => (r.get(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val carryRows = sums.toSeq.flatMap { case (g, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (_, pid, s) =>
        val c = acc; acc += s; (g, pid, c)
      }
    }
    val sess = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__g__",
        df.schema(groupCol).dataType),
      org.apache.spark.sql.types.StructField("__pid__",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__carry__",
        org.apache.spark.sql.types.LongType)))
    val carryDf = sess.createDataFrame(
      sess.sparkContext.parallelize(carryRows.map(t =>
        org.apache.spark.sql.Row(t._1, t._2, t._3)), 1), schema)
    local
      .join(broadcast(carryDf),
        col(groupCol) <=> col("__g__") && local("__pid__") === carryDf("__pid__"))
      .withColumn(out, col("__ls__") + col("__carry__"))
      .drop("__g__", "__pid__", "__ls__", "__carry__")
  }

  /** Exact `ntile(tiles)` per group on top of groupedRank: global ranks
    * mapped through the closed-form ntile formula (the first n%tiles
    * tiles get ⌈n/tiles⌉ rows). Same contract as groupedRank.
    */
  def groupedNtile(df: DataFrame, groupCol: String, sortCols: Seq[Column],
                   tiles: Int, out: String, partitions: Int = 32): DataFrame = {
    require(tiles >= 1, "groupedNtile: tiles must be >= 1")
    groupedRank(df, groupCol, sortCols, "__grank__", partitions)
      .withColumn("__n__", col("__grank___n"))
      .withColumn("__q__", expr(s"__n__ div $tiles"))
      .withColumn("__r__", expr(s"__n__ % $tiles"))
      .withColumn(out,
        when(col("__grank__") <= col("__r__") * (col("__q__") + lit(1L)),
          expr("CAST((__grank__ + __q__) div (__q__ + 1) AS BIGINT)"))
        .otherwise(expr("CAST(__r__ + (__grank__ - __r__ * (__q__ + 1) + __q__ - 1) div greatest(__q__, 1) AS BIGINT)")))
      .drop("__n__", "__q__", "__r__", "__grank__", "__grank___n")
  }
}
