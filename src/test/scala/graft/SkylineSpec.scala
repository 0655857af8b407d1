package graft

import graft.ext.Skyline

/** Skyline.skyline2D vs brute-force dominance on adversarial planted
  * sets: duplicates, full ties, staircases, and random clouds — the
  * sweep and the O(n²) definition must agree exactly.
  */
class SkylineSpec extends SparkSpec {

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet

  private def run(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Skyline.skyline2D(pts.toDF("id", "x", "y"), "id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("staircase, duplicates, and dominated interior points") {
    // staircase (10,30) (20,20) (30,10) all survive; (15,15) dominated;
    // exact duplicates of a frontier point BOTH survive; a same-x
    // lower-y point is dominated
    val pts = Seq(
      (1L, 10L, 30L), (2L, 20L, 20L), (3L, 30L, 10L),
      (4L, 15L, 15L), (5L, 20L, 20L), (6L, 20L, 5L))
    assert(run(pts) == brute(pts))
    assert(run(pts) == Set((1L, 10L, 30L), (2L, 20L, 20L),
      (3L, 30L, 10L), (5L, 20L, 20L)))
  }

  test("random clouds agree with brute force") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val pts = (1L to 300L).map(i =>
        (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      assert(run(pts) == brute(pts), s"trial $trial")
    }
  }

  test("single point and all-identical points survive") {
    assert(run(Seq((1L, 5L, 5L))) == Set((1L, 5L, 5L)))
    val same = (1L to 5L).map(i => (i, 7L, 7L))
    assert(run(same) == same.toSet)
  }
}
