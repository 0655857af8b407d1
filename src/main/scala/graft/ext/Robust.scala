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
    *
    * Bounds come from a per-group VALUE HISTOGRAM, not a per-row rank
    * window: the order statistic at index i is the smallest value whose
    * cumulative count reaches i, which needs only `groupBy(key, value)`
    * counts (a fully parallel partial aggregate over the rows) plus a
    * cumulative sum over the DISTINCT values of each group. This matters
    * precisely when the group key is low-cardinality (the common case for
    * winsorization — a handful of segments): a rank window over 3 groups
    * sorts a third of the table single-threaded per group, while the
    * histogram shuffles (key, value) pairs at full parallelism and sorts
    * only the distinct-value frame (measured 6 s → ~1 s at sf0.1). The
    * result is identical — ties collapse into one histogram bucket, so no
    * tie-break columns are even needed.
    *
    * Output: `keep` columns plus `lo`/`hi` (the group's bounds),
    * `<valueCol>_w` (clipped value) and `is_outlier`.
    */
  def winsorize(df: DataFrame, keyCol: String, valueCol: String,
                pLo: Double, pHi: Double, keep: Seq[String]): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentile range [$pLo, $pHi]")
    val hist = df.groupBy(keyCol, valueCol).agg(count(lit(1)).as("__c__"))
    val wOrd = Window.partitionBy(keyCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCol)
    val cum = hist
      .withColumn("__cum__", sum(col("__c__")).over(wOrd))
      .withColumn("__n__", sum(col("__c__")).over(wAll))
    def idx(p: Double): Column = greatest(lit(1L), ceil(lit(p) * col("__n__")))
    val bounds = cum.groupBy(keyCol).agg(
      min(when(col("__cum__") >= idx(pLo), col(valueCol))).as("lo"),
      min(when(col("__cum__") >= idx(pHi), col(valueCol))).as("hi"))
    df.join(bounds, keyCol)
      .select((keep.map(col) :+ col("lo") :+ col("hi") :+
        least(greatest(col(valueCol), col("lo")), col("hi")).as(s"${valueCol}_w") :+
        (col(valueCol) < col("lo") || col(valueCol) > col("hi")).as("is_outlier")): _*)
  }

  /** Nearest-rank order statistic per group via the value-histogram
    * path (see winsorize for why this beats a rank window at scale).
    *
    * The per-key cumsum window stays: even for a continuous value
    * column the per-group sort is over the distinct-VALUE histogram
    * (~10⁵ longs/group here — milliseconds); converting it to
    * Ranks.groupedRunningSum was measured SLOWER at sf0.1 (6.1 s vs
    * 3.3 s warm) because the checkpoint + carry collect dominates. At
    * a scale where the histogram itself is huge, switch to the
    * range-partitioned form — the crossover is well past 10⁷ distinct
    * values per group.
    */
  private def orderStat(df: DataFrame, keyCol: String, valueCol: String,
                        p: Double, statName: String): DataFrame = {
    val hist = df.groupBy(keyCol, valueCol).agg(count(lit(1)).as("__c__"))
    val wOrd = Window.partitionBy(keyCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCol)
    hist
      .withColumn("__cum__", sum(col("__c__")).over(wOrd))
      .withColumn("__n__", sum(col("__c__")).over(wAll))
      .groupBy(keyCol)
      .agg(min(when(col("__cum__") >=
        greatest(lit(1L), ceil(lit(p) * col("__n__"))), col(valueCol))).as(statName))
  }

  /** Median/MAD robust outlier flag: |v − median| > k·MAD, the
    * breakdown-resistant alternative to mean/stddev (one wild value
    * cannot move the threshold). Both statistics are nearest-rank order
    * statistics over integer values — two histogram passes, everything
    * engine-exact including the flag (pure integer comparison).
    */
  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
                  kMad: Int, keep: Seq[String]): DataFrame = {
    val med = orderStat(df, keyCol, valueCol, 0.5, "med")
    val withMed = df.join(med, keyCol)
      .withColumn("__dev__", abs(col(valueCol) - col("med")))
      .localCheckpoint(true) // consumed by the MAD order-stat AND the final join
    val mad = orderStat(withMed, keyCol, "__dev__", 0.5, "mad")
    withMed.join(mad, keyCol)
      .select((keep.map(col) :+ col("med") :+ col("mad") :+
        (col("__dev__") > lit(kMad.toLong) * col("mad")).as("is_outlier")): _*)
  }

  /** Per-group equal-frequency (equi-depth) discretization: value v maps
    * to bin ⌊B·cumBefore(v) / n⌋ where cumBefore counts STRICTLY smaller
    * values — pure integer arithmetic over the same value histogram
    * winsorize uses, so bin ids are engine-exact and ties always land in
    * one bin. The quantile-binning every feature pipeline needs, without
    * an interpolated (float, unhashable) quantile anywhere.
    *
    * Same scale shape as winsorize: parallel groupBy(key, value) counts,
    * cumsum over the small distinct-value frame, broadcast join back.
    */
  def equiDepthBins(df: DataFrame, keyCol: String, valueCol: String,
                    nBins: Int, keep: Seq[String]): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val hist = df.groupBy(keyCol, valueCol).agg(count(lit(1)).as("__c__"))
    val wBefore = Window.partitionBy(keyCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(keyCol)
    val binned = hist
      .withColumn("__cb__", coalesce(sum(col("__c__")).over(wBefore), lit(0L)))
      .withColumn("__n__", sum(col("__c__")).over(wAll))
      .select(col(keyCol), col(valueCol),
        expr(s"($nBins * __cb__) div __n__").as("bin"))
    df.join(binned, Seq(keyCol, valueCol))
      .select((keep.map(col) :+ col("bin")): _*)
  }

  /** Streaming-style anomaly flag: a point is anomalous when it sits more
    * than `kSigma` standard deviations from the mean of its `lookback`
    * PRECEDING points (current row excluded — the candidate must not
    * poison its own baseline).
    *
    * The test is evaluated in INTEGERS: with s=Σv, ss=Σv² over the
    * trailing frame of n rows, `(n·v − s)² > k²·(n·ss − s²)` is the exact
    * z² > k² condition cleared of divisions — no float mean/stddev, so
    * the flag is engine-exact and the driver hash-matches it (float
    * stddev windows differ in the last ulp across engines and would not).
    * `valueCol` must already be integral (e.g. cents).
    *
    * One shuffle on the key; the frame is ROWS-bounded so state is O(1)
    * per row in a streaming translation.
    */
  def trailingAnomaly(df: DataFrame, keyCol: String, orderCols: Seq[String],
                      valueCol: String, lookback: Int = 20,
                      minPrev: Int = 5, kSigma: Int = 3,
                      keep: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback, -1)
    val v = col(valueCol)
    val out = df
      .withColumn("n_prev", count(v).over(w))
      .withColumn("s_prev", coalesce(sum(v).over(w), lit(0L)))
      .withColumn("ss_prev", coalesce(sum(v * v).over(w), lit(0L)))
    val n = col("n_prev"); val s = col("s_prev"); val ss = col("ss_prev")
    val dev = n * v - s
    val flagged = out.withColumn("is_anomaly",
      n >= minPrev && dev * dev > lit(kSigma.toLong * kSigma) * (n * ss - s * s))
    val cols = (if (keep.isEmpty) df.columns.toSeq else keep).map(col) ++
      Seq(n, s, col("is_anomaly"))
    flagged.select(cols: _*)
  }
}
