package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planted-data ground truths for the fourth round-5 batch: lead-lag
  * cross-correlation (proportional series → r ≈ 1 at lag 0, exact pair
  * counts), n-gram novelty (hand-counted first appearances), golden
  * records (nation blocking splits identical names; survivorship rules),
  * phrase search (known top bigram, occurrence counts and positions).
  */
class Round5dSpec extends SparkSpec {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._


  test("q_xcorr: value = 10^6 × volume → r ≈ 1 at every lag; exact pair counts") {
    // day i (i = 1..8) has i events of value $100 → y(d) = 10^6·x(d)
    val rows = for { d <- 1 to 8; _ <- 1 to d } yield
      (java.sql.Timestamp.valueOf(f"2024-02-$d%02d 12:00:00"), 100.0)
    val dir = plant("/tmp/graft-test/xcorr", "events" -> rows.toDF("ts", "value"))
    val out = SparkEntry.queries("q_xcorr")(spark, dir)
      .collect().map(r => r.getAs[Int]("lag_k") -> r).toMap
    assert(out.size == 7)
    assert(out(0).getAs[Long]("n_pairs") == 8L)
    assert(out(1).getAs[Long]("n_pairs") == 7L && out(-1).getAs[Long]("n_pairs") == 7L)
    assert(out(3).getAs[Long]("n_pairs") == 5L && out(-3).getAs[Long]("n_pairs") == 5L)
    // y is an exact scalar multiple of x on every aligned pair set, so
    // Pearson r is 1 up to two correctly-rounded sqrts
    out.values.foreach(r => assert(math.abs(r.getAs[Double]("r") - 1.0) < 1e-12))
  }

  test("ta_novelty: hand-counted first appearances per doc") {
    val docs = Seq(
      (1L, "a b c d"), // {a b c, b c d} both first here → 10^6
      (2L, "a b c x"), // {a b c (doc 1), b c x (novel)} → 500000
      (3L, "a b c d")  // exact repeat → 0
    ).toDF("doc_id", "text")
    val dir = plant("/tmp/graft-test/novelty", "documents" -> docs)
    val out = SparkEntry.queries("ta_novelty")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 3)
    assert(out(1L).getAs[Long]("n_grams") == 2L && out(1L).getAs[Long]("novelty_micro") == 1000000L)
    assert(out(2L).getAs[Long]("n_novel") == 1L && out(2L).getAs[Long]("novelty_micro") == 500000L)
    assert(out(3L).getAs[Long]("n_novel") == 0L && out(3L).getAs[Long]("novelty_micro") == 0L)
  }

  test("er_golden: nation blocking splits identical names; survivorship rules") {
    val cust = Seq(
      (1L, "alice", 1L, 10.0, "A"),
      (2L, "alicf", 1L, 20.0, "B"), // dist 1 from alice, same nation → linked
      (3L, "alice", 2L, 30.0, "A"), // same name, other nation → NOT linked
      (4L, "bob", 1L, 40.0, "A")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val dir = plant("/tmp/graft-test/golden", "customer" -> cust)
    val out = SparkEntry.queries("er_golden")(spark, dir)
      .collect().map(r => r.getAs[Long]("entity_id") -> r).toMap
    assert(out.size == 3)
    val e1 = out(1L)
    assert(e1.getAs[Long]("n_members") == 2L)
    assert(e1.getAs[Long]("rep_custkey") == 1L && e1.getAs[String]("rep_name") == "alice")
    assert(e1.getAs[Long]("max_acctbal_c") == 2000L && e1.getAs[Long]("n_segments") == 2L)
    assert(out(3L).getAs[Long]("n_members") == 1L)
    assert(out(4L).getAs[Long]("n_members") == 1L)
  }

  test("srch_phrase: top bigram found with counts and first positions") {
    val docs = Seq(
      (1L, "x y x y"), // "x y" at 0 and 2
      (2L, "x y z"),   // "x y" at 0
      (3L, "q r")
    ).toDF("doc_id", "text")
    val dir = plant("/tmp/graft-test/phrase", "documents" -> docs)
    val out = SparkEntry.queries("srch_phrase")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 2)
    out.values.foreach(r => assert(r.getAs[String]("phrase") == "x y"))
    assert(out(1L).getAs[Long]("n_occ") == 2L && out(1L).getAs[Long]("first_pos") == 0L)
    assert(out(2L).getAs[Long]("n_occ") == 1L && out(2L).getAs[Long]("first_pos") == 0L)
  }
}
