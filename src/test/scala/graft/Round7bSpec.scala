package graft

import org.apache.spark.sql.functions._

/** Independent ground truths for the round-7 rows: every check here
  * re-derives the metric through a DIFFERENT code path (BigInt driver
  * arithmetic, closed forms, or brute-force replays) and compares it to
  * the query output at sf0.001.
  */
class Round7bSpec extends SparkSpec {

  test("ta_kappa: kappa_micro reproduces from its own contingency in BigInt") {
    val r = SparkEntry.queries("ta_kappa")(spark, sf0001).collect()
    assert(r.length === 1)
    val row = r(0)
    val n = BigInt(row.getAs[Long]("n_docs"))
    val n11 = BigInt(row.getAs[Long]("n11")); val n10 = BigInt(row.getAs[Long]("n10"))
    val n01 = BigInt(row.getAs[Long]("n01")); val n00 = BigInt(row.getAs[Long]("n00"))
    assert(n11 + n10 + n01 + n00 === n)
    val pm = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    val kn = n * (n11 + n00) - pm
    val kd = n * n - pm
    val expect = if (kn >= 0) (kn * 1000000) / kd else -((-kn * 1000000) / kd)
    assert(BigInt(row.getAs[Long]("kappa_micro")) === expect)
    assert(row.getAs[Long]("po_micro") === ((n11 + n00) * 1000000 / n).toLong)
  }

  test("ta_bleu: log_bleu reassembles from the integer pieces; bp is non-positive") {
    val rows = SparkEntry.queries("ta_bleu")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p1n, p1d) = (r.getAs[Long]("p1_num"), r.getAs[Long]("p1_den"))
      val (p2n, p2d) = (r.getAs[Long]("p2_num"), r.getAs[Long]("p2_den"))
      val bp = r.getAs[Long]("bp_micro")
      assert(bp <= 0L)
      assert(p1n <= p1d && p2n <= p2d, "clipped counts can never exceed totals")
      val (c, rr) = (r.getAs[Long]("c_total"), r.getAs[Long]("r_total"))
      if (c >= rr) assert(bp === 0L)
      else assert(bp === -(((rr - c) * 1000000L) / c))
      if (p1n > 0 && p2n > 0 && p1d > 0 && p2d > 0) {
        val l1 = math.round(math.log(p1n.toDouble / p1d) * 1e6)
        val l2 = math.round(math.log(p2n.toDouble / p2d) * 1e6)
        val expect = bp - ((-(l1 + l2)) / 2)
        assert(r.getAs[Long]("log_bleu_micro") === expect)
        assert(r.getAs[Long]("log_bleu_micro") <= 0L, "BLEU is at most 1")
      } else assert(r.isNullAt(r.fieldIndex("log_bleu_micro")))
    }
  }

  test("q_influence: top-5 rows ARE the global top-5 by |residual|, values exact") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet").select(col("l_returnflag"),
      col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byFlag = li.groupBy(_._1)
    val expect = byFlag.toSeq.flatMap { case (flag, rows) =>
      val n = BigInt(rows.length)
      val sx = rows.map(r => BigInt(r._4)).sum
      val sy = rows.map(r => BigInt(r._5)).sum
      val sxx = rows.map(r => BigInt(r._4) * r._4).sum
      val sxy = rows.map(r => BigInt(r._4) * r._5).sum
      val d = (n * sxx - sx * sx).max(BigInt(1))
      val scored = rows.map { r =>
        val eNum = BigInt(r._5) * d - (sy * sxx - sx * sxy) - (n * sxy - sx * sy) * r._4
        val eMicro = if (eNum >= 0) eNum * 1000000 / d else -((-eNum) * 1000000 / d)
        val hNum = d + (n * r._4 - sx) * (n * r._4 - sx)
        val hMicro = hNum * 1000000 / (n * d)
        (r._2, r._3, r._4, r._5, eMicro.toLong, hMicro.toLong)
      }
      scored.sortBy(t => (-math.abs(t._5), t._1 * 8 + t._2)).take(5).zipWithIndex
        .map { case (t, i) => (flag, i + 1L, t._1, t._2, t._3, t._4, t._5, t._6) }
    }.toSet
    val got = SparkEntry.queries("q_influence")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got === expect)
  }

  test("srch_mmr: every pick maximizes the marginal score at its step") {
    val out = SparkEntry.queries("srch_mmr")(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(out.length === 5)
    // independent pool: same BM25 helper, different greedy implementation
    val pool = ext.Search.bm25TopK(spark.read.parquet(s"$sf0001/documents.parquet"),
        "doc_id", "text", Seq("spark", "dup", "vector"), 20)
      .join(spark.read.parquet(s"$sf0001/documents.parquet").select(col("doc_id"),
        array_distinct(ext.Dedup.tokens(col("text"))).as("ts")), "doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_bp"),
        r.getAs[Seq[String]]("ts").toSet))
    val maxBp = math.max(pool.map(_._2).max, 1L)
    def reln(bp: Long) = BigInt(bp) * 1000000 / maxBp
    def jac(a: Set[String], b: Set[String]): BigInt = {
      val i = (a & b).size
      BigInt(i) * 1000000 / math.max(a.size + b.size - i, 1)
    }
    var selected = List.empty[(Long, Set[String])]
    out.foreach { row =>
      val remaining = pool.filter(p => !selected.exists(_._1 == p._1))
      val scored = remaining.map { p =>
        val ms = if (selected.isEmpty) BigInt(0)
          else selected.map(s => jac(p._3, s._2)).max
        (p._1, BigInt(7) * reln(p._2) - 3 * ms, ms)
      }
      val best = scored.minBy { case (id, mmr, _) => (-mmr, id) }
      assert(row.getAs[Long]("doc_id") === best._1,
        s"rank ${row.getAs[Long]("rank")} picked a non-optimal doc")
      assert(BigInt(row.getAs[Long]("mmr_score")) === best._2)
      assert(BigInt(row.getAs[Long]("maxsim_micro")) === best._3)
      selected ::= (best._1, pool.find(_._1 == best._1).get._3)
    }
  }

  test("ev_snips: value sits in [0, 1e6] and the normalizer is N_c per cohort") {
    val rows = SparkEntry.queries("ev_snips")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("snips_micro")
      assert(v >= 0L && v <= 1000000L, s"snips out of range: $v")
      // with all 5 actions logged, Σ π_t(a)·N_c = N_c·10⁶ exactly
      if (r.getAs[Long]("n_cells") == 5L)
        assert(r.getAs[Long]("den_micro") === r.getAs[Long]("n_events") * 1000000L)
    }
  }

  test("mm_goertzel + mm_zcr: closed forms of the planted bits") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val ids = Seq(0L, 5L, 13L, 99L, 255L)
    val docs = ids.map(i => (i, "t")).toDF("doc_id", "source")
    val w = ext.Multimodal.audioWindows(ext.Multimodal.vadMedia(docs), 400)
      .collect()
    ids.foreach { id =>
      val k = java.lang.Integer.bitCount(ext.Multimodal.vadBits(id))
      val mine = w.filter(_.media_id == id)
      assert(mine.map(_.n_zc).sum === k.toLong * 399L, s"zcr id $id")
      assert(mine.map(x => math.abs(x.alt_sum)).sum === k.toLong * 2400000L,
        s"goertzel id $id")
      assert(mine.count(_.n_zc > 0) === k, s"active windows id $id")
    }
  }

  test("stream_snips: the streamed cells produce exactly the batch estimator") {
    val batch = SparkEntry.queries("ev_snips")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val streamed = SparkEntry.queries("stream_snips")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(streamed === batch)
  }

  test("sim_lid: MLE is positive and reassembles from the summed micro-nats") {
    val rows = SparkEntry.queries("sim_lid")(spark, sf0001).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      val sm = r.getAs[Long]("s_micro")
      assert(k <= 10L && k >= 1L)
      assert(sm <= 0L, "nearest distances can never exceed the k-th")
      if (sm < 0L) {
        val lid = r.getAs[Long]("lid_milli")
        assert(lid === k * 1000000000L / (-sm))
        assert(lid > 0L)
      } else assert(r.isNullAt(r.fieldIndex("lid_milli")))
    }
  }

  test("ta_yule: K reassembles from the integer pieces and is non-negative") {
    val rows = SparkEntry.queries("ta_yule")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = BigInt(r.getAs[Long]("n_tokens"))
      val s2 = BigInt(r.getAs[Long]("sum_c2"))
      assert(s2 >= n, "Σc² ≥ N always (c ≥ 1)")
      assert(BigInt(r.getAs[Long]("yule_k_milli")) === (s2 - n) * 10000000 / (n * n))
    }
  }
}
