package graft

import org.apache.spark.sql.functions._
import graft.ext.{IvfIndex, Similarity}

class IvfSpec extends SparkSpec {

  private lazy val emb = SparkEntry.T(spark, sf0001, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 8)

  private def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("IVF with full probe (nProbe = k) is EXACTLY brute force") {
    val cents = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val index = IvfIndex.assign(emb, "vec_id", "embedding", cents)
    val ivf = IvfIndex.topK(index, queries, "vec_id", "embedding", cents,
      k = 10, nProbe = 8)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
    // full probe degenerates to an exhaustive scan → identical neighbor sets
    assert(neighborSets(ivf) == neighborSets(exact))
  }

  test("IVF partial probe trades recall for candidates, deterministically") {
    val cents = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val index = IvfIndex.assign(emb, "vec_id", "embedding", cents)
    val exact = neighborSets(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10))

    def recall(nProbe: Int): Double = {
      val got = neighborSets(IvfIndex.topK(index, queries, "vec_id", "embedding",
        cents, k = 10, nProbe = nProbe))
      exact.map { case (q, truth) =>
        got.getOrElse(q, Set.empty).count(truth).toDouble / truth.size
      }.sum / exact.size
    }

    val r2 = recall(2)
    val r5 = recall(5)
    assert(r5 >= r2, f"recall should not degrade with more probes: $r2%.2f -> $r5%.2f")
    assert(r2 > 0.15, f"even 2/8 cells should beat random: $r2%.2f")
    // determinism: same call twice, same answer
    assert(recall(2) == r2)
  }

  test("train balances cells: no empty cells after Lloyd on clustered-ish data") {
    val cents = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(cents.size == 8)
    val sizes = IvfIndex.assign(emb, "vec_id", "embedding", cents)
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(sizes.length >= 6, s"expected most of 8 cells non-empty, got ${sizes.length}")
    assert(sizes.sum == emb.count())
  }
}
