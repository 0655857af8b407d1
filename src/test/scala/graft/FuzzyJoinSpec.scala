package graft

import graft.ext.FuzzyJoin

/** editDistanceSelfJoin must equal the naive all-pairs levenshtein join —
  * deletion-neighborhood blocking is exact, not approximate.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteForce(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= d
    } yield (ia, ib, lev(sa, sb).toLong)).toSet

  private def run(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.editDistanceSelfJoin(rows.toDF("id", "s"), "id", "s", d)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("equals brute force on planted substitution/insert/delete/transpose cases") {
    val rows: Seq[(Long, String)] = Seq(
      1L -> "customer", 2L -> "custmer" /* deletion */,
      3L -> "customers" /* insertion */, 4L -> "cuztomer" /* substitution */,
      5L -> "ustomerc" /* rotation: far */, 6L -> "customer" /* identical */,
      7L -> "" /* empty */, 8L -> "c" /* short */, 9L -> "x",
      10L -> "cstmr")
    for (d <- 0 to 2)
      assert(run(rows, d) === bruteForce(rows, d), s"maxDist $d")
  }

  test("blockCol: pairs only within a block; NULL is its own block") {
    val sqlImplicits = spark.implicits
    import sqlImplicits._
    val df = Seq(
      (1L, "alice", Option(10L)), (2L, "alicf", Option(10L)), // same block → pair
      (3L, "alice", Option(20L)),                             // other block → no pair
      (4L, "alice", None: Option[Long]), (5L, "alicf", None)  // null block pairs with null
    ).toDF("id", "s", "blk")
    val got = ext.FuzzyJoin.editDistanceSelfJoin(df, "id", "s", 1, Some("blk"))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (4L, 5L)))
  }

  test("equals brute force on sf0.001 customer names at d=1 and d=2") {
    val rows = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    for (d <- Seq(1, 2)) {
      val got = run(rows, d)
      val want = bruteForce(rows, d)
      assert(got === want, s"maxDist $d")
      assert(want.nonEmpty, s"fixture should contain close names at d=$d")
    }
  }
}
