package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

class LayoutSpec extends SparkSpec {

  test("co-bucketed tables join and aggregate with zero shuffle exchanges") {
    implicit val s = spark
    val orders = SparkEntry.T(spark, sf0001, "orders")
    val customer = SparkEntry.T(spark, sf0001, "customer")

    // the in-memory catalog is fresh per JVM but the warehouse dir
    // survives — clear both so reruns don't hit LOCATION_ALREADY_EXISTS
    Seq("orders_b", "cust_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get(s"/tmp/graft-test-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }

    Layout.writeBucketed(orders, "orders_b", Seq("o_custkey"), 4, Seq("o_custkey"))
    Layout.writeBucketed(customer, "cust_b", Seq("c_custkey"), 4, Seq("c_custkey"))
    val ob = Layout.readTable(spark, "orders_b")
    val cb = Layout.readTable(spark, "cust_b")

    // force the sort-merge path (broadcast would hide the bucketing win)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ob.join(cb, ob("o_custkey") === cb("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_name")
      assert(Layout.isExchangeFree(joined),
        s"expected no shuffle Exchange:\n${joined.queryExecution.executedPlan}")
      // same result as the plain (shuffled) join
      val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      assert(joined.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // aggregation on the bucket key is exchange-free too
    val agg = ob.groupBy("o_custkey").agg(count(lit(1)).as("n"))
    assert(Layout.isExchangeFree(agg),
      s"expected no Exchange:\n${agg.queryExecution.executedPlan}")
    assert(agg.count() == orders.select("o_custkey").distinct().count())

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS cust_b")
  }

  test("partitioned layout prunes directories at planning time") {
    val events = SparkEntry.events(spark, sf0001)
      .withColumn("day", to_date(col("ts")))
    val path = "/tmp/graft-test-events-partitioned"
    Layout.writePartitioned(events, path, Seq("event_type"))

    val back = spark.read.parquet(path)
    val filtered = back.where(col("event_type") === "click")
    val (selected, total) = Layout.prunedPartitions(filtered)
    assert(total > 1, "fixture should produce multiple event_type partitions")
    assert(selected == 1, s"expected 1 pruned partition, got $selected/$total")
    // pruning must not change results
    assert(filtered.count() ==
      events.where(col("event_type") === "click").count())
  }

  test("compact: many small files become few, rows survive, sort enables cross-file pruning") {
    val src = "/tmp/graft-test/compact-in"
    val out = "/tmp/graft-test/compact-out"
    val li = SparkEntry.T(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    // simulate a streaming writer: 40 tiny files
    li.repartition(40).write.mode("overwrite").parquet(src)
    val bytes = Option(new java.io.File(src).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum

    val (before, after) = Layout.compact(spark, src, out,
      targetBytes = bytes / 3, sortCols = Seq("l_orderkey"))
    assert(before == 40L, s"fixture wrote $before files")
    assert(after <= 4L && after >= 2L, s"expected ~3 compacted files, got $after")

    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
    assert(back.select(sum("l_quantity")).head().getDouble(0) ==
      li.select(sum("l_quantity")).head().getDouble(0))

    // range-partitioned rewrite ⇒ files carry disjoint l_orderkey ranges:
    // a selective key predicate must prune whole files at the scan
    val files = Option(new java.io.File(out).listFiles()).get
      .filter(_.getName.endsWith(".parquet")).map(f => spark.read.parquet(f.getPath))
    val ranges = files.map(f =>
      (f.agg(min("l_orderkey")).head().getLong(0), f.agg(max("l_orderkey")).head().getLong(0)))
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlapping file ranges: $sorted")
      case _ =>
    }
  }

  test("saltedJoin equals the plain join for inner and left") {
    val orders = SparkEntry.T(spark, sf0001, "orders")
    val customer = SparkEntry.T(spark, sf0001, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plainInner = orders.join(customer, Seq("o_custkey"))
    val saltedInner = graft.ext.Skew.saltedJoin(orders, customer, Seq("o_custkey"))
    assert(saltedInner.count() == plainInner.count())
    val key = saltedInner.select(sum(col("o_orderkey") * col("o_totalprice")))
      .head().getDouble(0)
    val keyPlain = plainInner.select(sum(col("o_orderkey") * col("o_totalprice")))
      .head().getDouble(0)
    assert(math.abs(key - keyPlain) < 1e-6 * math.abs(keyPlain))

    val plainLeft = orders.join(customer, Seq("o_custkey"), "left")
    val saltedLeft = graft.ext.Skew.saltedJoin(orders, customer, Seq("o_custkey"), "left")
    assert(saltedLeft.count() == plainLeft.count())
  }
}
