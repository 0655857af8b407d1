package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline / Pareto frontier (Börzsönyi, Kossmann, Stocker, ICDE
  * 2001), maximizing both dimensions: a point survives iff no other
  * point is ≥ in both coordinates and > in at least one.
  *
  * Sweep formulation instead of the quadratic dominance join: group
  * points by x (keep each group's max y), order groups by x DESC, and a
  * group's representative y survives iff it STRICTLY exceeds every y at
  * larger x — an exclusive prefix max. The prefix max decomposes across
  * range partitions exactly like ev_rfm's ranks (per-partition running
  * max + ≤P carried scalars), so there is NO single-partition sort:
  * wall-clock is one keyed aggregate, one range exchange, and a
  * partition-local window. Equal (x, y) duplicates all survive (neither
  * dominates — dominance needs one strict coordinate), which the
  * final (x, y) semi-join preserves.
  */
object Skyline {

  /** Skyline of `df` maximizing (`x`, `y`); `y` must be LongType (exact
    * integer metrics — cents, counts). Returns the surviving rows with
    * their (id, x, y) columns.
    */
  def skyline2D(df: DataFrame, id: String, x: String, y: String,
                partitions: Int = 32): DataFrame = {
    val pts = df.select(col(id), col(x), col(y))
    val gm = pts.groupBy(x).agg(max(col(y)).as("__ymax__"))
    val ranged = gm.repartitionByRange(partitions, col(x).desc)
      .withColumn("__pid__", spark_partition_id().cast("long"))
      .localCheckpoint(true)
    val w = Window.partitionBy("__pid__").orderBy(col(x).desc)
    val local = ranged.withColumn("__pre__",
      max(col("__ymax__")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
    val pmax = ranged.groupBy("__pid__").agg(max(col("__ymax__")).as("__pm__"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // carry(p) = max ymax over partitions with SMALLER pid (= larger x)
    var run = Long.MinValue
    val carry = pmax.map { case (p, m) => val c = run; run = math.max(run, m); (p, c) }
    val sess = df.sparkSession
    import sess.implicits._
    val carryDf = carry.toSeq.toDF("__pid__", "__carry__")
    val frontier = local.join(broadcast(carryDf), Seq("__pid__"))
      .filter(col("__ymax__") >
        greatest(coalesce(col("__pre__"), lit(Long.MinValue)), col("__carry__")))
      .select(col(x), col("__ymax__").as(y))
    pts.join(frontier, Seq(x, y), "left_semi")
      .select(col(id), col(x), col(y))
  }
}
