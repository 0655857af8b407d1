package graft

import graft.ext.{Dedup, Similarity, Vectors}
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Quantitative ground-truth checks for the LSH/dedup/similarity family —
  * the operators whose driver checks are rows-only. Truth sets are computed
  * brute-force (all-pairs, exact) over the sf0.001 corpus on the driver, so
  * every assertion is against exact values, not another approximation:
  *
  *  - minhash:  exact n-gram Jaccard per pair → recall on true near-dups +
  *              precision band for reported pairs
  *  - simhash:  exact Hamming distances → reported ⊆ truth, and the
  *              pigeonhole-guaranteed region (≤ bands-1 bits) is complete
  *  - ngram:    reported jaccard values equal the exact local values
  *  - winnow:   exact local mirror of the capped fingerprint join →
  *              set equality
  *  - embed:    exact cosine all-pairs → recall of the OR-construction
  *  - topk:     LSH top-k recall vs the exact brute-force top-k
  */
class GroundTruthSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  private lazy val texts: Map[Long, String] =
    docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def toks(t: String): Array[String] =
    t.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private def ngrams(t: String, n: Int): Set[String] = {
    val tk = toks(t)
    if (tk.length < n) Set.empty else tk.sliding(n).map(_.mkString(" ")).toSet
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else { val i = (a & b).size; i.toDouble / (a.size + b.size - i) }

  private def allPairs[T](ids: Seq[Long])(f: (Long, Long) => T): Seq[((Long, Long), T)] =
    for { i <- ids.indices; j <- (i + 1) until ids.length }
      yield (ids(i), ids(j)) -> f(ids(i), ids(j))

  test("minhash pairs: recall + precision vs exact n-gram jaccard truth") {
    val grams = texts.map { case (id, t) => id -> ngrams(t, 3) }.filter(_._2.nonEmpty)
    val ids = grams.keys.toSeq.sorted
    val exact = allPairs(ids)((a, b) => jaccard(grams(a), grams(b))).toMap
    // true near-dups: comfortably above the 0.5 operating threshold
    val truth = exact.filter(_._2 >= 0.6).keySet
    assert(truth.nonEmpty, "fixture must contain planted near-dup pairs")

    val found = Dedup.minhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(found).toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall on ${truth.size} true pairs (found ${found.size})")
    // precision band: estimated-jaccard ≥ 0.5 admits only pairs whose
    // exact jaccard is within estimator noise of the threshold
    found.foreach { case (a, b) =>
      val j = exact.getOrElse((a, b), 0.0)
      assert(j >= 0.3, s"pair ($a,$b) reported but exact jaccard is $j")
    }
  }

  test("simhash pairs: reported ⊆ hamming truth; pigeonhole region complete; values exact") {
    val hashes = texts.map { case (id, t) => id -> Hashing.simhash64(t) }
    val ids = hashes.keys.toSeq.sorted
    val dist = allPairs(ids)((a, b) =>
      java.lang.Long.bitCount(hashes(a) ^ hashes(b))).toMap

    val reported = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt).toMap
    // every reported distance is the exact local distance
    reported.foreach { case (p, h) => assert(dist(p) == h, s"pair $p: reported $h, exact ${dist(p)}") }
    // 4×16-bit banding GUARANTEES pairs within bands-1 = 3 bits are found
    val guaranteed = dist.filter(_._2 <= 3).keySet
    assert(guaranteed.subsetOf(reported.keySet),
      s"pigeonhole region incomplete: missing ${guaranteed -- reported.keySet}")
    // and everything reported is within the requested radius
    assert(reported.values.forall(_ <= 8))
  }

  test("ngram jaccard pairs: values equal the exact local jaccard") {
    val grams = texts.map { case (id, t) => id -> ngrams(t, 3) }.filter(_._2.nonEmpty)
    val reported = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(reported.nonEmpty)
    reported.foreach { case ((a, b), j) =>
      val exact = jaccard(grams(a), grams(b))
      assert(math.abs(j - exact) < 1e-12, s"pair ($a,$b): reported $j, exact $exact")
      assert(j >= 0.5)
    }
    // recall against clearly-above-threshold truth
    val ids = grams.keys.toSeq.sorted
    val truth = allPairs(ids)((a, b) => jaccard(grams(a), grams(b)))
      .filter(_._2 >= 0.65).map(_._1)
    assert(truth.nonEmpty)
    val recall = truth.count(reported.keySet).toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall on ${truth.size} true pairs")
  }

  test("winnow pairs: set equality with the exact local mirror (incl. doc-freq cap)") {
    val k = 8; val w = 16; val minShared = 5; val maxDocFreq = 20
    val fps: Map[Long, Set[Long]] =
      texts.map { case (id, t) => id -> Hashing.winnowLocal(t, k, w).toSet }
    val docFreq = fps.values.flatten.groupBy(identity).map { case (fp, xs) => fp -> xs.size }
    val kept: Map[Long, Set[Long]] =
      fps.map { case (id, s) => id -> s.filter(docFreq(_) <= maxDocFreq) }
    val ids = kept.keys.toSeq.sorted
    val truth = allPairs(ids)((a, b) => (kept(a) & kept(b)).size)
      .filter(_._2 >= minShared).toMap

    val reported = Dedup.winnowPairs(docs, "doc_id", "text", k, w, minShared, maxDocFreq)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(reported.keySet == truth.keySet,
      s"extra=${reported.keySet -- truth.keySet} missing=${truth.keySet -- reported.keySet}")
    reported.foreach { case (p, n) => assert(n == truth(p).toLong, s"pair $p shared count") }
    assert(truth.nonEmpty, "fixture must contain near-copy pairs")
  }

  test("embedding near-dup: recall of the 16-table OR-construction vs exact cosine") {
    val vecs: Map[Long, Array[Float]] = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vecs.keys.toSeq.sorted
    val truth = allPairs(ids)((a, b) => cosine(vecs(a), vecs(b)))
      .filter(_._2 >= 0.45).map(_._1).toSet
    assert(truth.nonEmpty)
    val found = Dedup.embeddingDupPairs(emb, "vec_id", "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(truth))
    val recall = truth.count(found).toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall on ${truth.size} true pairs (found ${found.size})")
  }

  test("lsh top-k: recall vs exact brute-force top-k") {
    val queries = emb.filter(col("vec_id") < 8)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = bf.count(lsh).toDouble / bf.size
    assert(recall >= 0.7, s"lsh top-k recall $recall (${lsh.size} of ${bf.size})")
  }
}
