package graft

import graft.ext.Ranks
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranks.groupedRank / groupedNtile / groupedRunningSum must equal the
  * plain low-cardinality-partition window forms exactly — on data large
  * enough to spread across many range partitions, with duplicate sort
  * values forcing the total-order tie-break to do real work.
  */
class RanksSpec extends SparkSpec {

  private def fixture(n: Int, groups: Int, dupSpread: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to n).map(i =>
      (i.toLong, s"g${rnd.nextInt(groups)}", rnd.nextInt(dupSpread).toLong,
        (rnd.nextInt(9) + 1).toLong))
      .toDF("id", "g", "v", "wt")
  }

  test("groupedRank equals row_number over the group window") {
    val df = fixture(5000, 3, 40)
    val want = df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)).cast("long"))
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ranks.groupedRank(df, "g", Seq(col("v").asc, col("id").asc), "rk",
        partitions = 8)
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("groupedNtile equals ntile over the group window, all tile counts") {
    val df = fixture(3000, 4, 25)
    for (tiles <- Seq(2, 4, 5, 7)) {
      val want = df.withColumn("t", ntile(tiles).over(
          Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)).cast("long"))
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = Ranks.groupedNtile(df, "g", Seq(col("v").asc, col("id").asc),
          tiles, "t", partitions = 8)
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"tiles=$tiles")
    }
  }

  test("groupedNtile handles groups smaller than the tile count") {
    import spark.implicits._
    val tiny = Seq((1L, "a", 1L, 1L), (2L, "a", 2L, 1L), (3L, "b", 1L, 1L))
      .toDF("id", "g", "v", "wt")
    val want = tiny.withColumn("t", ntile(5).over(
        Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)).cast("long"))
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ranks.groupedNtile(tiny, "g", Seq(col("v").asc, col("id").asc),
        5, "t", partitions = 8)
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("groupedRunningSum equals the cumulative group window") {
    val df = fixture(5000, 3, 40)
    // make (g, v, id) a total order — cumsum over it
    val want = df.withColumn("cum", sum(col("wt")).over(
        Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ranks.groupedRunningSum(df, "g",
        Seq(col("v").asc, col("id").asc), "wt", "cum", partitions = 8)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
