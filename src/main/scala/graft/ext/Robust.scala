package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust / outlier-aware statistics for feature cleaning.
  *
  * Percentiles here are NEAREST-RANK order statistics (the value at
  * 1-based index max(1, ⌈p·n⌉)), not interpolated quantiles: an
  * interpolated quantile is a float blend of two values whose last ulp
  * depends on the engine's expression order, so it can never hash-match
  * across engines — the order statistic is a value that EXISTS in the
  * data and is engine-exact (same reasoning as the integer fixed-point
  * PageRank).
  *
  * Scale shape: ONE shuffle on the group key — row_number and the
  * per-partition count ride the same window partitioning, the bound
  * aggregate reuses that exchange, and the |groups|-row bounds frame
  * joins back as a broadcast. No driver collect, no global sort.
  */
object Robust {

  /** Per-group winsorization: clip `valueCol` to its [pLo, pHi]
    * nearest-rank order statistics within each group of `keyCol`.
    * Ties in `valueCol` are broken by `tieCols` so ranks (and thus
    * bounds) are deterministic regardless of physical row order.
    *
    * Output: `keep` columns plus `<valueCol>_w` (clipped value),
    * `lo`/`hi` (the group's bounds) and `is_outlier`.
    */
  def winsorize(df: DataFrame, keyCol: String, valueCol: String,
                pLo: Double, pHi: Double,
                tieCols: Seq[String], keep: Seq[String]): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentile range [$pLo, $pHi]")
    val ordered = Window.partitionBy(keyCol)
      .orderBy((col(valueCol) +: tieCols.map(col)): _*)
    val whole = Window.partitionBy(keyCol)
    val ranked = df
      .withColumn("__rn__", row_number().over(ordered))
      .withColumn("__n__", count(lit(1)).over(whole))
    def idx(p: Double): Column = greatest(lit(1L), ceil(lit(p) * col("__n__")))
    val bounds = ranked.groupBy(keyCol).agg(
      min(when(col("__rn__") === idx(pLo), col(valueCol))).as("lo"),
      min(when(col("__rn__") === idx(pHi), col(valueCol))).as("hi"))
    ranked.join(bounds, keyCol)
      .select((keep.map(col) :+ col("lo") :+ col("hi") :+
        least(greatest(col(valueCol), col("lo")), col("hi")).as(s"${valueCol}_w") :+
        (col(valueCol) < col("lo") || col(valueCol) > col("hi")).as("is_outlier")): _*)
  }
}
