package graft

import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}

class PqSpec extends SparkSpec {

  private lazy val emb = SparkEntry.T(spark, sf0001, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 8)

  private def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  /** Codebooks holding EVERY distinct subvector: encoding is lossless. */
  private def losslessBooks(m: Int): Pq.Codebooks = {
    val vecs = emb.select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val sd = vecs.head.length / m
    (0 until m).map { mm =>
      vecs.map(v => java.util.Arrays.copyOfRange(v, mm * sd, (mm + 1) * sd))
        .distinct.toArray
    }
  }

  test("lossless codebooks: ADC top-k equals brute force (codes reconstruct exactly)") {
    val books = losslessBooks(4)
    val enc = Pq.encode(emb, "vec_id", "embedding", books)
    val pq = Pq.adcTopK(enc, queries, "vec_id", "embedding", books, 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
    assert(neighborSets(pq) == neighborSets(exact))
    // and the scores agree to float-accumulation-order tolerance
    val ps = pq.select("query_id", "neighbor_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val es = exact.select("query_id", "neighbor_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ps.foreach { case (k, v) =>
      assert(math.abs(v - es(k)) < 1e-9, s"score drift at $k: $v vs ${es(k)}")
    }
  }

  test("trained codebooks: ADC shortlist + exact refine keeps useful recall at 64x compression") {
    val books = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 4, k = 64, iters = 3)
    val enc = Pq.encode(emb, "vec_id", "embedding", books)
    val truth = neighborSets(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10))
    def recallOf(got: Map[Long, Set[Long]]): Double = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).count(t).toDouble / t.size
    }.sum / truth.size

    val adcOnly = recallOf(neighborSets(Pq.adcTopK(enc, queries, "vec_id", "embedding", books, 10)))
    val refined = recallOf(neighborSets(
      Pq.refinedTopK(enc, emb, queries, "vec_id", "embedding", books, 10, shortlist = 50)))
    info(f"PQ recall@10 (m=4, k=64): adc-only $adcOnly%.2f, refined(50) $refined%.2f")
    // unstructured random vectors are PQ's worst case; refine recovers
    assert(refined >= adcOnly, f"refine must not hurt: $adcOnly%.2f -> $refined%.2f")
    assert(refined >= 0.4, f"refined PQ recall collapsed: $refined%.2f")
    // determinism: training + search twice gives the same answer
    val books2 = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 4, k = 64, iters = 3)
    val got1 = neighborSets(Pq.refinedTopK(enc, emb, queries, "vec_id", "embedding", books, 10))
    val got2 = neighborSets(Pq.refinedTopK(
      Pq.encode(emb, "vec_id", "embedding", books2), emb, queries, "vec_id", "embedding", books2, 10))
    assert(got1 == got2)
  }

  test("IVFPQ: all cells + lossless codebooks degenerates to brute force exactly") {
    val books = losslessBooks(4)
    val cents = graft.ext.IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val got = Pq.ivfPqTopK(emb, queries, "vec_id", "embedding", cents, books,
      k = 10, nProbe = 8, shortlist = 500)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
    assert(neighborSets(got) == neighborSets(exact))
  }

  test("IVFPQ: compressed + partial probe keeps useful recall, never beats its refine") {
    val books = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 4, k = 64, iters = 2)
    val cents = graft.ext.IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val truth = neighborSets(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10))
    def recallOf(got: Map[Long, Set[Long]]): Double = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).count(t).toDouble / t.size
    }.sum / truth.size
    val r3 = recallOf(neighborSets(Pq.ivfPqTopK(emb, queries, "vec_id", "embedding",
      cents, books, k = 10, nProbe = 3, shortlist = 50)))
    val r8 = recallOf(neighborSets(Pq.ivfPqTopK(emb, queries, "vec_id", "embedding",
      cents, books, k = 10, nProbe = 8, shortlist = 50)))
    info(f"IVFPQ recall@10: nProbe=3 $r3%.2f, nProbe=8 $r8%.2f")
    assert(r8 >= r3, f"more probes must not hurt: $r3%.2f -> $r8%.2f")
    assert(r3 > 0.2, f"IVFPQ recall collapsed: $r3%.2f")
  }

  test("encode emits compact codes and exact reconstruction norms") {
    val books = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    val enc = Pq.encode(emb, "vec_id", "embedding", books).collect()
    assert(enc.length == emb.count())
    enc.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 4 && codes.forall(c => c >= 0 && c < 16))
      // rnorm must equal the norm of the decoded vector
      val recon = codes.zipWithIndex.flatMap { case (c, mm) => books(mm)(c) }
      val n = math.sqrt(recon.map(x => x * x).sum)
      assert(math.abs(r.getDouble(2) - n) < 1e-9)
    }
  }
}
