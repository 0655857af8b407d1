package graft

import graft.functions.{Hashing, SketchAgg}
import org.apache.spark.sql.functions._

/** Sketch aggregates (functions/SketchAgg.scala): HyperLogLog registers and
  * Count-Min counters. Assertions are against exact local mirrors and the
  * sketches' mathematical guarantees — no approximation-vs-approximation:
  *
  *  - HLL registers equal a driver-side replay of idx/rho maxima, and are
  *    IDENTICAL under 1-partition vs 32-partition execution (order-free
  *    max-merge = partitioning invariance, the property that makes the
  *    DuckDB oracle and 1000-executor runs agree);
  *  - the HLL estimate lands within the theoretical error envelope
  *    (σ ≈ 1.04/√m → 3 σ band) of the exact cardinality;
  *  - CMS estimates are one-sided: est ≥ true count for EVERY key, and
  *    est == true when no other key shares all 4 buckets;
  *  - CMS counters are partitioning-invariant (sum-merge).
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  private val p = 10
  private val m = 1 << p

  test("hll registers match a local replay and are partitioning-invariant") {
    val n = 20000
    val keys = (0 until n).map(i => s"key-${i % 7919}") // 7919 distinct
    // local replay
    val expect = new Array[Int](m)
    keys.foreach { k =>
      val b = k.getBytes("UTF-8")
      val (idx, rho) =
        SketchAgg.hllIdxRho(Hashing.fmix64(Hashing.fnv1a64(b, 0, b.length)), p)
      if (rho > expect(idx)) expect(idx) = rho
    }
    def regsOf(parts: Int): Seq[Int] = {
      val df = keys.toDF("k").repartition(parts)
      df.agg(SketchAgg.hllRegisters(col("k"), p).as("r"))
        .head.getSeq[Int](0)
    }
    val r1 = regsOf(1)
    val r32 = regsOf(32)
    assert(r1 == r32, "registers must not depend on partitioning")
    assert(r1 == expect.toSeq, "registers must equal the local replay")
  }

  test("hll estimate is within the 3-sigma envelope of exact cardinality") {
    // raw-regime cardinalities (n >= 2.5m): the raw estimator applies
    for (exact <- Seq(5000, 50000)) {
      val df = (0 until exact).map(i => s"u$i").toDF("k")
      val regs = df.agg(SketchAgg.hllRegisters(col("k"), p).as("r"))
        .head.getSeq[Int](0)
      var z = 0.0
      regs.foreach(r => z += math.pow(2.0, -r))
      val est = 0.7213 / (1.0 + 1.079 / m) * m * m / z
      val sigma = 1.04 / math.sqrt(m.toDouble) * exact
      assert(math.abs(est - exact) <= 3 * sigma,
        s"exact=$exact est=$est outside 3 sigma ($sigma)")
    }
  }

  test("hll zeros column supports linear counting below the raw regime") {
    // below 2.5m the raw estimator is biased up (textbook); the emitted
    // zero-register count V is the sufficient statistic for the standard
    // small-range correction m*ln(m/V), which the CALLER applies (kept out
    // of the query because ln is not bit-stable across engines)
    val exact = 500
    val df = (0 until exact).map(i => s"u$i").toDF("k")
    val regs = df.agg(SketchAgg.hllRegisters(col("k"), p).as("r"))
      .head.getSeq[Int](0)
    val v = regs.count(_ == 0)
    assert(v > 0)
    val lc = m * math.log(m.toDouble / v)
    assert(math.abs(lc - exact) <= 0.05 * exact, s"linear counting $lc vs $exact")
  }

  test("cms estimates are one-sided and exact for uncollided keys") {
    val depth = 4
    val logW = 10
    val rnd = new scala.util.Random(7)
    val rows = (0 until 30000).map(_ => s"item-${rnd.nextInt(2500)}")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = rows.toDF("k")
    val sk = df.agg(SketchAgg.cmsCounters(col("k"), depth, logW).as("cms"))
    val est = df.distinct()
      .join(broadcast(sk))
      .select(col("k"), SketchAgg.cmsEstimate(col("cms"), col("k"), depth, logW).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one-sided everywhere
    truth.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k: est ${est(k)} < true $c")
    }
    // collision-free keys are exact: replay buckets locally to find them
    val (as, bs) = Hashing.permConsts(depth)
    def buckets(k: String): Seq[Int] = {
      val b = k.getBytes("UTF-8")
      val h = Hashing.fnv1a64(b, 0, b.length)
      (0 until depth).map(i => ((as(i) * h + bs(i)) >>> (64 - logW)).toInt)
    }
    val allKeys = truth.keys.toSeq
    val byBucket = Array.fill(depth)(collection.mutable.Map.empty[Int, Int])
    allKeys.foreach { k =>
      buckets(k).zipWithIndex.foreach { case (bk, i) =>
        byBucket(i)(bk) = byBucket(i).getOrElse(bk, 0) + 1
      }
    }
    val lonely = allKeys.filter(k =>
      buckets(k).zipWithIndex.exists { case (bk, i) => byBucket(i)(bk) == 1 })
    assert(lonely.nonEmpty, "fixture should have uncollided keys")
    lonely.foreach { k =>
      assert(est(k) == truth(k), s"uncollided $k: est ${est(k)} != true ${truth(k)}")
    }
  }

  test("cms counters are partitioning-invariant") {
    val rows = (0 until 5000).map(i => s"w${i % 300}")
    def countersOf(parts: Int): Seq[Long] =
      rows.toDF("k").repartition(parts)
        .agg(SketchAgg.cmsCounters(col("k"), 4, 8).as("c"))
        .head.getSeq[Long](0)
    assert(countersOf(1) == countersOf(16))
  }

  test("ols on exactly-linear data recovers the coefficients") {
    // y = 3 + 2*x1 + 5*x2 with integer features: the Gram solve must
    // reproduce the plane almost exactly (only double roundoff).
    val rows = for (x1 <- 1 to 40; x2 <- 1 to 25)
      yield (x1.toLong, x2.toLong, 3L + 2 * x1 + 5 * x2)
    val df = rows.toDF("x1", "x2", "y")
    val vec = array(lit(1L), col("x1"), col("x2"), col("y"))
    val g = df.agg(graft.functions.GramAgg.gram(vec, 4).as("g")).head.getSeq[Long](0)
    val a00 = g(0).toDouble; val a01 = g(1).toDouble; val a02 = g(2).toDouble
    val b0 = g(3).toDouble
    val a11 = g(4).toDouble; val a12 = g(5).toDouble; val b1 = g(6).toDouble
    val a22 = g(7).toDouble; val b2 = g(8).toDouble
    val det = a00 * (a11 * a22 - a12 * a12) - a01 * (a01 * a22 - a12 * a02) +
      a02 * (a01 * a12 - a11 * a02)
    val beta0 = (b0 * (a11 * a22 - a12 * a12) - a01 * (b1 * a22 - a12 * b2) +
      a02 * (b1 * a12 - a11 * b2)) / det
    val beta1 = (a00 * (b1 * a22 - a12 * b2) - b0 * (a01 * a22 - a12 * a02) +
      a02 * (a01 * b2 - b1 * a02)) / det
    val beta2 = (a00 * (a11 * b2 - a12 * b1) - a01 * (a01 * b2 - b1 * a02) +
      b0 * (a01 * a12 - a11 * a02)) / det
    assert(math.abs(beta0 - 3.0) < 1e-6, s"beta0=$beta0")
    assert(math.abs(beta1 - 2.0) < 1e-9, s"beta1=$beta1")
    assert(math.abs(beta2 - 5.0) < 1e-9, s"beta2=$beta2")
  }
}
