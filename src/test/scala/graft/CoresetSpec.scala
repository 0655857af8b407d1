package graft

import org.apache.spark.sql.functions._

/** Greedy k-center selection: hand-computed farthest-first traversal,
  * deterministic tie-breaks, and equality with an exhaustive driver-side
  * greedy on a planted set.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  test("farthest-first traversal with min-id seed and (d desc, id) ties") {
    // 1-D points: id0→0, id1→10, id2→4, id3→6
    // seed = id0 (min id). round 2: farthest from {0} is id1 (d=100).
    // round 3: id2 has min(16,36)=16, id3 has min(36,16)=16 — tie → id2.
    // round 4: id3: min(36,16,4)=4.
    val data = Seq((0L, Array(0.0)), (1L, Array(10.0)), (2L, Array(4.0)), (3L, Array(6.0)))
      .toDF("vec_id", "embedding")
    val got = ext.Coreset.kCenter(data, "vec_id", "embedding", 4)
      .orderBy("sel_rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, 0L, 0.0), (2, 1L, 100.0), (3, 2L, 16.0), (4, 3L, 4.0)))
  }

  test("matches an exhaustive driver-side greedy on a deterministic cloud") {
    // 40 deterministic 3-D points; compare the distributed selection
    // against a plain Scala reference implementation
    val pts = (0 until 40).map { i =>
      (i.toLong, Array(((i * 37) % 41).toDouble, ((i * 17) % 29).toDouble, ((i * 7) % 13).toDouble))
    }
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ref = scala.collection.mutable.ArrayBuffer[Long](0L)
    for (_ <- 2 to 6) {
      val cand = pts.filterNot(p => ref.contains(p._1))
        .map(p => (p._1, ref.map(s => d2(p._2, pts(s.toInt)._2)).min))
      val best = cand.minBy { case (id, d) => (-d, id) }
      ref += best._1
    }
    val got = ext.Coreset.kCenter(pts.toDF("vec_id", "embedding"), "vec_id", "embedding", 6)
      .orderBy("sel_rank").collect().map(_.getLong(1)).toSeq
    assert(got == ref.toSeq)
  }
}
