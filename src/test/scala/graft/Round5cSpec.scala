package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planted-data ground truths for the third round-5 batch: the KmvAgg
  * bottom-k aggregate (exact eviction order vs a locally computed
  * unsigned sort, merge across partitions), grouped/streamed theta
  * estimates (not-full sketches degrade to exact counts; stream ≡
  * batch), the geometric-mechanism DP noise (independent exact-fraction
  * inverse-CDF replay), and k-NN majority voting (constructed
  * two-cluster embedding space).
  */
class Round5cSpec extends SparkSpec {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  private def plant(dir: String, tables: (String, DataFrame)*): String = {
    tables.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("KmvAgg: bottom-16 equals the locally computed unsigned sort; merges across partitions") {
    val keys = (1 to 300).map(i => s"key-$i")
    val df = keys.toDF("k").repartition(8) // force partial-buffer merges
    val arr = df.agg(graft.functions.SketchAgg.kmvBottomK(col("k"), 16).as("a"))
      .collect()(0).getSeq[Long](0)
    val expected = keys
      .map { s => graft.functions.Hashing.fmix64(graft.functions.Hashing.fnv1a64(s)) }
      .distinct
      .sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)
      .take(16)
    assert(arr.toSeq == expected.toSeq)
  }

  test("sk_theta_grouped: not-full sketches give exact per-flag counts; duplicates collapse") {
    val li = ((1 to 10).flatMap(o => Seq(("A", o.toLong), ("A", o.toLong))) ++
      (1 to 5).map(o => ("B", o.toLong))).toDF("l_returnflag", "l_orderkey")
    val dir = plant("/tmp/graft-test/kmvg", "lineitem" -> li)
    val out = SparkEntry.queries("sk_theta_grouped")(spark, dir)
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(out("A").getAs[Long]("n_sk") == 10L && out("A").getAs[Long]("kmv_est") == 10L)
    assert(out("A").getAs[Long]("exact_nd") == 10L)
    assert(out("B").getAs[Long]("n_sk") == 5L && out("B").getAs[Long]("kmv_est") == 5L)
  }

  test("stream_theta equals the batch sketch on the same table") {
    val li = (1 to 400).map(o => ("A", o.toLong)).toDF("l_returnflag", "l_orderkey")
    val dir = plant("/tmp/graft-test/kmvs", "lineitem" -> li)
    val batch = SparkEntry.queries("sk_theta_grouped")(spark, dir).collect()
    val streamed = SparkEntry.queries("stream_theta")(spark, dir).collect()
    assert(batch.map(_.toString).sorted.toSeq == streamed.map(_.toString).sorted.toSeq)
    // 400 distinct keys overflow k=256: the estimate is a genuine
    // projection now, not the exact count — sanity-band it
    val est = batch.head.getAs[Long]("kmv_est")
    assert(batch.head.getAs[Long]("n_sk") == 256L)
    assert(est > 300L && est < 520L, s"kmv_est $est far outside the ±3σ band")
  }

  test("q_dp: noise matches an independent exact-fraction inverse-CDF replay") {
    val orders = Seq.fill(7)("1-URGENT") ++ Seq.fill(3)("2-HIGH")
    val dir = plant("/tmp/graft-test/dp",
      "orders" -> orders.toDF("o_orderpriority"))
    val out = SparkEntry.queries("q_dp")(spark, dir)
      .collect().map(r => r.getAs[String]("pri") -> r).toMap
    assert(out.size == 2)
    // independent replay: md5 fraction via MessageDigest, inverse CDF
    // walked with BigInt fractions (NOT the query's precomputed longs)
    def expectedNoise(pri: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dp:$pri".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u32 = java.lang.Long.parseLong(hex, 16)
      val den = BigInt(3) * BigInt(256)
      var cum = BigInt(0)
      val order = 0L +: (1 to 8).flatMap(k => Seq(k.toLong, -k.toLong))
      for (n <- order) {
        cum += (if (n == 0L) BigInt(256) else BigInt(1) << (8 - math.abs(n).toInt))
        // u32 / 2^32 < cum/den  ⇔  u32 · den < cum · 2^32
        if (BigInt(u32) * den < cum * BigInt(2).pow(32)) return n
      }
      9L
    }
    for ((pri, r) <- out) {
      assert(r.getAs[Long]("noise") == expectedNoise(pri), s"noise for $pri")
      assert(r.getAs[Long]("dp_n") == r.getAs[Long]("n") + r.getAs[Long]("noise"))
    }
    assert(out("1-URGENT").getAs[Long]("n") == 7L)
  }

  test("sim_knn: two-cluster space — majority label wins, 6 votes each") {
    // pool: 6 vecs near [1,0] labeled 1, 6 near [-1,0] labeled 2; each
    // anchor's top-10 keeps all 6 of its cluster + 4 of the other
    val pool = (0 until 6).map(i => (8L + i, Seq(1f, 0.01f * (i + 1)), 1)) ++
      (0 until 6).map(i => (14L + i, Seq(-1f, 0.01f * (i + 1)), 2))
    val anchors = Seq((0L, Seq(1f, 0f), 1), (1L, Seq(-1f, 0f), 2))
    val emb = (anchors ++ pool).toDF("vec_id", "embedding", "label")
    val dir = plant("/tmp/graft-test/knn", "embeddings" -> emb)
    val out = SparkEntry.queries("sim_knn")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out.size == 2)
    for (id <- Seq(0L, 1L)) {
      assert(out(id).getAs[Int]("pred_label") == out(id).getAs[Int]("truth_label"), s"anchor $id")
      assert(out(id).getAs[Long]("n_votes") == 6L)
    }
  }
}
