package graft

import org.apache.spark.sql.functions._
import graft.ext.BloomPrune

class BloomPruneSpec extends SparkSpec {

  private lazy val orders = SparkEntry.T(spark, sf0001, "orders")
  private lazy val cust = SparkEntry.T(spark, sf0001, "customer")
    .filter(col("c_mktsegment") === "BUILDING")
    .select("c_custkey", "c_name")

  test("bloom-pruned join is EXACTLY the plain join") {
    val pruned = BloomPrune.prunedJoin(orders, cust, "o_custkey", "c_custkey", 10000)
      .select("o_orderkey", "o_custkey", "c_name")
    val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_name")
    assert(pruned.collect().toSet == plain.collect().toSet)
    assert(pruned.count() == plain.count())
  }

  test("no false negatives: every dim key probes true; pruning actually prunes") {
    val bf = BloomPrune.buildFilter(cust, "c_custkey", 10000)
    val misses = cust.filter(!graft.functions.BloomExpr.mightContain(col("c_custkey"), bf)).count()
    assert(misses == 0, s"bloom dropped $misses true keys — false negatives are impossible")

    val total = orders.count()
    val kept = BloomPrune.prune(orders, "o_custkey", bf).count()
    val trueMatches = orders.join(cust, col("o_custkey") === col("c_custkey")).count()
    assert(kept < total, s"selective dim should prune: kept $kept of $total")
    assert(kept >= trueMatches / math.max(1L,
      orders.groupBy("o_custkey").count().count()) || kept > 0)
    info(f"pruned $total -> $kept fact rows (join output $trueMatches)")
  }

  test("string keys probe through the same UTF-8 bytes the builder hashed") {
    val dim = cust.select(col("c_name"))
    val bf = BloomPrune.buildFilter(dim, "c_name", 10000)
    val misses = dim.filter(!graft.functions.BloomExpr.mightContain(col("c_name"), bf)).count()
    assert(misses == 0)
    // disjoint strings mostly probe false (fpp-bounded)
    val foreign = spark.range(5000).select(concat(lit("zz_"), col("id").cast("string")).as("c_name"))
    val fp = foreign.filter(graft.functions.BloomExpr.mightContain(col("c_name"), bf)).count()
    assert(fp < 500, s"false-positive rate blew past any sane fpp: $fp / 5000")
  }

  test("the probe stays inside whole-stage codegen") {
    val bf = BloomPrune.buildFilter(cust, "c_custkey", 10000)
    val plan = BloomPrune.prune(orders, "o_custkey", bf)
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage; a CodegenFallback probe would strip it from the Filter
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("graft_bloom_might_contain") && l.trim.startsWith("*(")),
      s"bloom Filter not inside a codegen stage:\n$plan")
  }
}
