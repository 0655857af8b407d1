package graft

import graft.sources.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Z-order clustering: correctness of the interleave and the measurable
  * claim — a box predicate on the SECOND dimension prunes row groups in a
  * z-ordered layout where a first-dimension-sorted layout reads ~everything.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other.collect { case f: FileSourceScanExec => f }
    }
    walk(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("zValue interleaves bits exactly (local mirror over the corner cases)") {
    def mirror(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 0L), (0L, 1023L),
      (512L, 256L), (1023L, 1023L), (77L, 613L))
    val df = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 10).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == mirror(r.getLong(0), r.getLong(1), 10),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // locality: neighbors in both dims are close in z
    assert(mirror(100, 100, 10) - mirror(100, 99, 10) < 1024)
  }

  test("z-ordered layout prunes a y-only box; x-sorted layout cannot") {
    val n = 1 << 20
    // deterministic pseudo-uniform 10-bit dims from the row id
    val base = spark.range(n.toLong).select(
      (hash(col("id")).cast("long").bitwiseAND(1023L)).as("x"),
      (hash(col("id"), lit(1)).cast("long").bitwiseAND(1023L)).as("y"),
      col("id").as("payload"))
    val zPath = "/tmp/graft-test/zorder_z"
    val xPath = "/tmp/graft-test/zorder_x"
    Layout.writeZOrdered(base, zPath, "x", "y", files = 64, bits = 10)
    base.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xPath)

    def box(path: String): DataFrame =
      spark.read.parquet(path).filter(col("y") >= 100 && col("y") <= 131)

    val zRows = scanRows(box(zPath))
    val xRows = scanRows(box(xPath))
    val want = box(zPath).count()
    assert(box(xPath).count() == want, "layouts must hold identical data")
    // x-sorted layout: y min/max spans ~everything in every row group
    assert(xRows > n / 2, s"x-sorted scan pruned unexpectedly: $xRows")
    // z-ordered: row groups have tight y envelopes → most are skipped
    assert(zRows < xRows / 2, s"z scan $zRows not < half of x scan $xRows")
    assert(zRows >= want, "scan can never emit fewer rows than the answer")
  }
}
