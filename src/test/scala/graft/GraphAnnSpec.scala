package graft

import org.apache.spark.sql.functions._
import graft.ext.{GraphAnn, Similarity}

class GraphAnnSpec extends SparkSpec {

  private lazy val emb = SparkEntry.T(spark, sf0001, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 8)

  private def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("graph has bounded out-degree and no self-loops") {
    val g = GraphAnn.buildGraph(emb, "vec_id", "embedding", degree = 8)
    val maxDeg = g.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= 8, s"out-degree must be capped at 8, got $maxDeg")
    assert(g.filter(col("src") === col("dst")).isEmpty)
  }

  test("beam search is deterministic and well-formed") {
    val g = GraphAnn.buildGraph(emb, "vec_id", "embedding", degree = 8)
    def run() = GraphAnn.topK(emb, g, queries, "vec_id", "embedding",
      k = 10, ef = 16, rounds = 3, nSeeds = 4)
    val a = run().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = run().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "same index + same search must return identical rows")
    val df = run()
    assert(df.filter(col("neighbor_id") === col("query_id")).isEmpty)
    // ranks are 1..n contiguous and scores non-increasing within a query
    val byQ = df.collect().groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("wider beams never lose recall; ef=16/3 rounds beats random") {
    val g = GraphAnn.buildGraph(emb, "vec_id", "embedding", degree = 8)
    val exact = neighborSets(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10))
    def recall(ef: Int, rounds: Int): Double = {
      val got = neighborSets(GraphAnn.topK(emb, g, queries, "vec_id", "embedding",
        k = 10, ef = ef, rounds = rounds, nSeeds = 4))
      exact.map { case (q, truth) =>
        got.getOrElse(q, Set.empty).count(truth).toDouble / truth.size
      }.sum / exact.size
    }
    val base = recall(16, 3)
    // beam ⊆ candidates each round makes quality monotone in ef at fixed
    // rounds; more rounds explores strictly more of the graph
    assert(recall(32, 3) >= base, "wider beam must not lose recall")
    assert(base > 0.15, f"beam search should beat random: $base%.2f")
  }
}
