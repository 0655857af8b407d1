package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the round-7 operators: personalized PageRank, the
  * HMM forward fold, ray-casting point-in-polygon, interval-overlap
  * join, the recommendation-diversity panel and energy-threshold VAD
  * over real WAV round-trips.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("personalizedPageRankInt concentrates mass on the seed side") {
    // path graph 1-2-3-4 (symmetrized), seed = {1}
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val r = ext.Graph.personalizedPageRankInt(edges, seeds, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L))
    // hand replay: r0 = (1e6, 0, 0, 0)
    // i1 inbox: node2 gets 1e6 (deg(1)=1) -> r1 = (150000, 850000, 0, 0)
    assert(r(1L) > r(4L), s"seed should outrank the far end: $r")
    assert(r(2L) > r(4L))
    // exact replay of the integer recurrence
    def step(rk: Map[Long, Long]): Map[Long, Long] = {
      val deg = Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L)
      val inbox = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
        .groupBy(_._2).view.mapValues(_.map { case (s, _) => rk(s) / deg(s) }.sum).toMap
      (1L to 4L).map(v => v -> ((if (v == 1L) 150000L else 0L) +
        850L * inbox.getOrElse(v, 0L) / 1000L)).toMap
    }
    var exp = Map(1L -> 1000000L, 2L -> 0L, 3L -> 0L, 4L -> 0L)
    for (_ <- 0 until 3) exp = step(exp)
    assert(r === exp, s"engine $r vs hand replay $exp")
  }

  test("hmm forward fold matches a direct scala replay") {
    def scalaFold(obs: Seq[Long]): Long = {
      var a0 = 500000L; var a1 = 500000L
      obs.foreach { o =>
        val t0 = (a0 * 900000L + a1 * 200000L) / 1000000L
        val t1 = (a0 * 100000L + a1 * 800000L) / 1000000L
        val u0 = t0 * (if (o == 1L) 300000L else 700000L) / 1000000L
        val u1 = t1 * (if (o == 1L) 800000L else 200000L) / 1000000L
        val s = math.max(u0 + u1, 1L)
        a0 = u0 * 1000000L / s; a1 = 1000000L - a0
      }
      a1
    }
    val cases = Seq(Seq(0L, 0L, 0L), Seq(1L, 1L, 1L, 1L), Seq(0L, 1L, 0L, 1L, 1L), Seq.empty[Long])
    val df = cases.zipWithIndex.map { case (o, i) => (i.toLong, o) }.toDF("id", "obs")
    val got = df.select(col("id"),
        (expr("aggregate(obs, CAST(5000000500000 AS BIGINT), (acc, o) -> " +
          "((((((acc div 10000000) * 900000 + (acc % 10000000) * 200000) div 1000000) * " +
          "(CASE WHEN o = 1 THEN 300000 ELSE 700000 END)) div 1000000 * 1000000) div " +
          "greatest(((((acc div 10000000) * 900000 + (acc % 10000000) * 200000) div 1000000) * " +
          "(CASE WHEN o = 1 THEN 300000 ELSE 700000 END)) div 1000000 + " +
          "((((acc div 10000000) * 100000 + (acc % 10000000) * 800000) div 1000000) * " +
          "(CASE WHEN o = 1 THEN 800000 ELSE 200000 END)) div 1000000, 1)) * 10000000 + " +
          "(1000000 - (((((((acc div 10000000) * 900000 + (acc % 10000000) * 200000) div 1000000) * " +
          "(CASE WHEN o = 1 THEN 300000 ELSE 700000 END)) div 1000000) * 1000000) div " +
          "greatest(((((acc div 10000000) * 900000 + (acc % 10000000) * 200000) div 1000000) * " +
          "(CASE WHEN o = 1 THEN 300000 ELSE 700000 END)) div 1000000 + " +
          "((((acc div 10000000) * 100000 + (acc % 10000000) * 800000) div 1000000) * " +
          "(CASE WHEN o = 1 THEN 800000 ELSE 200000 END)) div 1000000, 1))))") % 10000000L).as("a1"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case (o, i) =>
      assert(got(i.toLong) === scalaFold(o), s"case $i obs=$o")
    }
    // all-1 observations must push the engaged probability up, all-0 down
    assert(got(1L) > 800000L, s"all-engaged evidence too weak: ${got(1L)}")
    assert(got(0L) < 200000L, s"all-idle evidence too strong: ${got(0L)}")
  }

  test("vad wav roundtrip: windows reproduce the planted bits") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val ids = Seq(0L, 1L, 7L, 42L, 255L, 1000L)
    val docs = ids.map(i => (i, "t")).toDF("doc_id", "source")
    val media = ext.Multimodal.vadMedia(docs)
    val w = ext.Multimodal.audioWindows(media, 400).collect()
    assert(w.length === ids.size * 8, "every clip must window into exactly 8")
    w.foreach { aw =>
      val bit = (ext.Multimodal.vadBits(aw.media_id) >> aw.win_idx.toInt) & 1
      assert(aw.n_frames === 400L)
      // speech block: 400 samples of |6000|; silence: all zero
      assert(aw.sum_abs === (if (bit == 1) 400L * 6000L else 0L),
        s"clip ${aw.media_id} window ${aw.win_idx}")
    }
  }

  test("pip crossing parity agrees with java.awt's polygon on a grid") {
    // independent implementation: AWT's even-odd ray crossing
    val poly = new java.awt.Polygon()
    Seq((-30000000L, 10000000L), (-10000000L, 40000000L), (20000000L, 25000000L),
      (45000000L, 50000000L), (30000000L, -5000000L)).foreach { case (x, y) =>
      poly.addPoint((x / 1000000L).toInt, (y / 1000000L).toInt)
    }
    // probe a grid in whole degrees strictly off the polygon edges
    val pts = for (lon <- -40L to 50L by 3L; lat <- -10L to 55L by 3L)
      yield (lon * 1000000L + 500001L, lat * 1000000L + 500001L)
    val df = pts.toDF("lon", "lat")
    val got = SparkEntry.pipInside(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    pts.foreach { case (lon, lat) =>
      val expected = poly.contains(lon / 1e6, lat / 1e6)
      assert(got((lon, lat)) === expected, s"($lon, $lat)")
    }
  }

  test("interval overlap query equals a nested-loop reference at sf0.001") {
    val bucketed = SparkEntry.queries("q_interval_overlap")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // reference: plain cross+filter (the plan the bucketing must equal)
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("a"),
        date_add(col("o_orderdate").cast("date"),
          expr("CAST(1 + o_orderkey % 30 AS INT)")).as("b"))
    val promos = Seq((1L, "1993-05-15", "1993-07-10"), (2L, "1994-11-20", "1995-01-05"),
      (3L, "1995-06-01", "1995-06-30"), (4L, "1996-02-10", "1996-04-25"),
      (5L, "1996-12-15", "1997-02-01"), (6L, "1997-08-05", "1997-09-20"))
      .toDF("promo_id", "ps", "pe")
      .select(col("promo_id"), to_date(col("ps")).as("ps"), to_date(col("pe")).as("pe"))
    val ref = o.crossJoin(promos).filter(col("a") <= col("pe") && col("ps") <= col("b"))
      .groupBy("promo_id").agg(count(lit(1)).as("n"),
        sum((datediff(least(col("b"), col("pe")), greatest(col("a"), col("ps"))) + 1)
          .cast("long")).as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bucketed === ref)
  }

  test("stream_hmm's last snapshots equal the batch ev_hmm fold at sf0.001") {
    def rows(q: String) = SparkEntry.queries(q)(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(rows("stream_hmm") === rows("ev_hmm"))
  }

  test("srch_rocchio expansion terms exclude the seeds and rank by weight") {
    val rows = SparkEntry.queries("srch_rocchio")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (tok, dfFb, dfC, _) =>
      assert(!Set("spark", "dup", "vector").contains(tok))
      assert(tok.length >= 3)
      assert(dfFb <= 10L, "feedback df cannot exceed the feedback set")
      assert(dfC >= dfFb, "corpus df dominates feedback df")
    }
    val ws = rows.map(_._4)
    assert(ws.sameElements(ws.sortBy(-_)), "rows must arrive weight-desc")
  }

  test("dunning G2 matches a direct scala computation on a planted corpus") {
    // "big data" appears 6x together; "big" also precedes other words
    val docs = Seq(
      (1L, "big data big data big data big apple big orange small data"),
      (2L, "big data big data big data small apple tiny orange small pear"))
      .toDF("doc_id", "text")
    val got = ext.LangModel.dunningCollocations(docs, "doc_id", "text",
      minCount = 5, topK = 5).collect()
    assert(got.nonEmpty)
    val row = got.find(r => r.getString(0) == "big" && r.getString(1) == "data").get
    val c12 = row.getLong(2).toDouble
    // direct replay over hand-counted marginals
    val all = Seq("big data big data big data big apple big orange small data",
      "big data big data big data small apple tiny orange small pear")
      .flatMap { t => val w = t.split("\\s+"); w.zip(w.tail) }
    val nb = all.size.toDouble
    val k11 = all.count(_ == ("big", "data")).toDouble
    val c1 = all.count(_._1 == "big").toDouble
    val c2 = all.count(_._2 == "data").toDouble
    assert(c12 === k11)
    def term(k: Double, r: Double, c: Double): Double =
      if (k > 0) k * math.log(k * nb / (r * c)) else 0.0
    val g2 = 2.0 * (term(k11, c1, c2) + term(c1 - k11, c1, nb - c2) +
      term(c2 - k11, nb - c1, c2) + term(nb - c1 - c2 + k11, nb - c1, nb - c2))
    assert(row.getLong(3) === math.round(g2 * 1e6), s"expected G2=$g2")
  }

  test("kneser-ney probabilities are valid and favor diverse continuations") {
    val docs = Seq((1L, "a b a b a b a c x b y b z b w c"))
      .toDF("doc_id", "text")
    val got = ext.LangModel.kneserNeyBigrams(docs, "doc_id", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    got.values.foreach { r =>
      val p = r.getLong(7)
      assert(p > 0L && p <= 1000000L, s"pkn out of range: $r")
    }
    // P(b|a) discounts to the continuation prob of b, which is high
    // (b follows many contexts) vs c (follows few)
    val pAB = got(("a", "b")).getLong(7)
    val pAC = got(("a", "c")).getLong(7)
    assert(pAB > pAC, s"P(b|a)=$pAB should beat P(c|a)=$pAC")
  }

  test("ev_psm_match pairs are stratum-balanced at sf0.001") {
    val rows = SparkEntry.queries("ev_psm_match")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // independent pair-count check: min(#treated, #control) per stratum
    val cut = "2024-01-15 00:00:00"
    val u = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy("user_id")
      .agg(sum(when(col("ts") < lit(cut).cast("timestamp"), 1L).otherwise(0L)).as("pre_n"))
      .withColumn("treated", col("user_id") % 2 === 0)
      .groupBy("pre_n").agg(
        sum(when(col("treated"), 1L).otherwise(0L)).as("nt"),
        sum(when(!col("treated"), 1L).otherwise(0L)).as("nc"))
      .collect().map(r => r.getLong(0) -> math.min(r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (preN, nPairs) = (r.getLong(0), r.getLong(1))
      assert(nPairs === u(preN), s"stratum $preN")
      assert(math.abs(r.getLong(4)) <= 1000000L, "ATT is a response-rate diff")
    }
  }

  test("ev_event_study anchors the k = -1 effect at exactly zero") {
    val rows = SparkEntry.queries("ev_event_study")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(rows.contains(-1L), "the anchor week must exist")
    assert(rows(-1L)._2 === 0L, "effect at the anchor is zero by construction")
    assert(rows.size >= 3, "should cover several relative weeks")
  }

  test("sim_nprobe_sweep recall is monotone and agrees with sim_ivf_recall at nprobe=3") {
    val sweep = SparkEntry.queries("sim_nprobe_sweep")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // monotone non-decreasing in nprobe per query
    sweep.keys.map(_._1).toSeq.distinct.foreach { q =>
      val hs = (1L to 4L).map(p => sweep((q, p)))
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b },
        s"recall not monotone for query $q: $hs")
    }
    val ivf3 = SparkEntry.queries("sim_ivf_recall")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ivf3.foreach { case (q, h) => assert(sweep((q, 3L)) === h, s"query $q") }
  }

  test("mm_loudness equals the closed form of the planted square wave") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val ids = Seq(0L, 3L, 9L, 77L, 255L)
    val docs = ids.map(i => (i, "t")).toDF("doc_id", "source")
    val media = ext.Multimodal.vadMedia(docs)
    val got = ext.Multimodal.audioWindows(media, 400).toDF()
      .groupBy("media_id")
      .agg(sum("n_frames").as("n"), sum("sum_sq").as("q"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    ids.foreach { id =>
      val k = java.lang.Integer.bitCount(ext.Multimodal.vadBits(id))
      assert(got(id) === ((3200L, k.toLong * 400L * 36000000L)), s"id $id")
    }
  }

  test("er_bcubed: blocking can only split gold clusters, so precision = 1") {
    val r = SparkEntry.queries("er_bcubed")(spark, sf0001).collect()(0)
    val (p, rec, f1) = (r.getLong(3), r.getLong(4), r.getLong(5))
    // nation blocking removes links, so every predicted cluster is a
    // subset of a gold cluster: B³ precision is exactly 1.0
    assert(p === 1000000L, s"precision should be exactly 1.0, got $p")
    assert(rec > 0L && rec <= 1000000L)
    assert(f1 <= 1000000L && f1 >= rec, "F1 lies between R and P")
    assert(r.getLong(1) >= r.getLong(2), "blocking can only create MORE clusters")
  }

  test("rec_diversity invariants hold at sf0.001") {
    val row = SparkEntry.queries("rec_diversity")(spark, sf0001).collect()(0)
    val (nLists, nRecs, nRecItems) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val coverage = row.getLong(3); val hhi = row.getLong(4)
    assert(nRecs <= nLists * 3, "top-3 lists cannot exceed 3 recs per list")
    assert(nRecItems <= nRecs)
    assert(coverage > 0L && coverage <= 1000000L)
    // HHI is bounded below by perfect uniformity over the recommended items
    assert(hhi >= 1000000L / nRecItems && hhi <= 1000000L)
  }
}
