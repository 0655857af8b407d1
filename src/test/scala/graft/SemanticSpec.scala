package graft

import graft.ext.{Graph, Semantic}
import org.apache.spark.sql.functions._

/** SemDeDup ground truth: within-cell pairs are a verified-exact subset of
  * the all-pairs cosine truth with recall bound; the kept set is the
  * transitive dedup of the found pairs; degenerate cells stay capped.
  */
class SemanticSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  private def exactVecs: Map[Long, Array[Float]] =
    emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("semanticPairs ⊆ exact all-pairs truth with recall >= 0.8; dedup is transitive") {
    val vecs = exactVecs
    val ids = vecs.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.size
      c = cosine(vecs(ids(i)), vecs(ids(j))) if c >= 0.45
    } yield (ids(i), ids(j))).toSet
    assert(truth.nonEmpty, "fixture must contain semantic near-dups")

    val found = Semantic.semanticPairs(emb, "vec_id", "embedding",
      threshold = 0.45, cells = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(truth), s"false positives: ${found -- truth}")
    val recall = truth.count(found).toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall on ${truth.size} true pairs")

    // the kept set is exactly the min-id representatives of the components
    // induced by the FOUND pairs (internal transitive consistency)
    val kept = Semantic.semDedup(emb, "vec_id", "embedding", 0.45, cells = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pairsDf = found.toSeq.toDF("id_a", "id_b")
    val expect = Graph.clusterDedup(emb.select(col("vec_id")), "vec_id", pairsDf)
      .collect().map(_.getLong(0)).toSet
    assert(kept === expect)
    assert(kept.size < ids.size, "some near-dups must be dropped")
  }

  test("degenerate corpus: one constant-embedding cluster stays capped and keeps one row") {
    val n = 500
    val df = (0 until n).map(i => (i.toLong, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Semantic.semanticPairs(df, "vec_id", "embedding",
      threshold = 0.99, cells = 2, maxCell = 50)
    // spanning star: identical rows over the cap produce O(n) pairs, not n²/2
    val np = pairs.count()
    assert(np < 3L * n, s"star cap must bound candidates, got $np")
    val kept = Semantic.semDedup(df, "vec_id", "embedding", 0.99, cells = 2, maxCell = 50)
    assert(kept.count() === 1L, "all-identical corpus must collapse to one row")
  }
}
