package graft

import graft.functions.SketchAgg
import org.apache.spark.sql.functions._

/** MisraGriesAgg ground truths: the deterministic guarantees
  * (f − n/(k+1) ≤ est ≤ f; every f > n/(k+1) key present) must hold under
  * EVERY partitioning — raw estimates may differ across merge orders, the
  * theorems may not.
  */
class MisraGriesSpec extends SparkSpec {

  private def checkGuarantees(data: Seq[Long], k: Int, parts: Int): Unit = {
    import spark.implicits._
    val df = spark.sparkContext.parallelize(data, parts).toDF("key")
    val cand = df.agg(SketchAgg.misraGries(col("key"), k).as("mg"))
      .select(explode(col("mg")).as("c"))
      .select(col("c.key").as("key"), col("c.est").as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    assert(cand.size <= k, s"more than $k candidates: ${cand.size}")
    cand.foreach { case (key, est) =>
      val f = exact.getOrElse(key, 0L)
      assert(est <= f, s"overestimate for $key at $parts parts: $est > $f")
      assert((f - est) * (k + 1) <= n,
        s"underestimate beyond n/(k+1) for $key at $parts parts")
    }
    exact.foreach { case (key, f) =>
      if (f * (k + 1) > n)
        assert(cand.contains(key),
          s"guaranteed hitter $key (f=$f, n=$n, k=$k) missing at $parts parts")
    }
  }

  test("planted zipf-ish stream: guarantees hold at 1, 3, 8 and 32 partitions") {
    // key 1 has majority mass; keys 2-4 moderate; 50 singleton keys
    val data: Seq[Long] =
      Seq.fill(600)(1L) ++ Seq.fill(150)(2L) ++ Seq.fill(120)(3L) ++
        Seq.fill(80)(4L) ++ (100L until 150L)
    for (parts <- Seq(1, 3, 8, 32); k <- Seq(1, 2, 3, 5))
      checkGuarantees(data, k, parts)
  }

  test("domain smaller than k degrades to exact counts") {
    import spark.implicits._
    val data = Seq.fill(40)(7L) ++ Seq.fill(25)(8L)
    val df = spark.sparkContext.parallelize(data, 4).toDF("key")
    val cand = df.agg(SketchAgg.misraGries(col("key"), 5).as("mg"))
      .select(explode(col("mg")).as("c"))
      .select(col("c.key"), col("c.est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cand === Map(7L -> 40L, 8L -> 25L))
  }

  test("eval orders candidates (est desc, key asc)") {
    import spark.implicits._
    val data = Seq.fill(30)(2L) ++ Seq.fill(30)(1L) ++ Seq.fill(9)(3L)
    val df = spark.sparkContext.parallelize(data, 1).toDF("key")
    val arr = df.agg(SketchAgg.misraGries(col("key"), 3).as("mg"))
      .select(col("mg")).collect()(0).getSeq[org.apache.spark.sql.Row](0)
    val keys = arr.map(_.getLong(0))
    val ests = arr.map(_.getLong(1))
    assert(ests.sorted.reverse === ests, "not est-descending")
    // the two tied majority keys break ties by key asc
    assert(keys.take(2) === Seq(1L, 2L))
  }
}
