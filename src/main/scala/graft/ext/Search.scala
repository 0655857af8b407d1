package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Keyword search over the corpus: BM25 (Robertson/Spärck Jones) ranking
  * as one declarative plan.
  *
  * Scale shape (100 TB): for a handful of query terms the right plan is a
  * vocabulary-projected scan, not a materialized inverted index — per-term
  * tf columns are computed inline (codegen'd array expressions, corpus
  * touched ONCE, zero data shuffles), document frequencies and corpus
  * stats come from ONE single-row aggregate broadcast back, and the top-k
  * is TakeOrderedAndProject (bounded per-partition heap, never a full
  * sort). Nothing but the k result rows and one stats row ever crosses
  * the wire.
  *
  * Determinism: per-doc scores sum per-term contributions in FIXED
  * textual order (term list order), never via a shuffle-order-dependent
  * sum(). The only transcendental is ln() in idf, which can differ by
  * 1 ulp across math libraries — scores are therefore exposed as
  * `floor(score·10⁴)` basis points alongside exact integer tf columns.
  */
object Search {

  /** BM25 top-k: rank documents for a bag of query `terms`; docs matching
    * no term are excluded. Returns (id, n_terms, tf_total, score_bp).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: terms must be non-empty")
    val toks = Dedup.tokens(col(textCol))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === t)).cast(LongType).as(s"__tf${i}__")
    }
    val base = docs.select((col(idCol) +: size(toks).cast(LongType).as("dl") +: tfCols): _*)

    // ONE single-row aggregate: corpus size, total length, per-term df
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("dl_sum") +: terms.indices.map(i =>
        sum(when(col(s"__tf${i}__") > 0, 1L).otherwise(0L)).as(s"__df${i}__")): _*))

    val nD = col("n_docs").cast(DoubleType)
    val avgdl = col("dl_sum").cast(DoubleType) / nD
    def contrib(i: Int): Column = {
      val tf = col(s"__tf${i}__").cast(DoubleType)
      val dfq = col(s"__df${i}__").cast(DoubleType)
      val idf = log((nD - dfq + 0.5) / (dfq + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast(DoubleType) / avgdl))
    }
    // fixed textual order: c0 + c1 + ... — reproducible bit-for-bit
    val score = terms.indices.map(contrib).reduce(_ + _)
    val tfTotal = terms.indices.map(i => col(s"__tf${i}__")).reduce(_ + _)
    val nTerms = terms.indices.map(i =>
      when(col(s"__tf${i}__") > 0, 1L).otherwise(0L)).reduce(_ + _)

    base.crossJoin(broadcast(stats))
      .filter(tfTotal > 0)
      .select(col(idCol), nTerms.as("n_terms"), tfTotal.as("tf_total"),
        floor(score * 10000).cast(LongType).as("score_bp"))
      .orderBy(col("score_bp").desc, col(idCol).asc)
      .limit(k)
  }

  /** Hybrid retrieval: a BM25 keyword pool and a cosine vector pool fused
    * by reciprocal-rank fusion (Cormack, Clarke, Büttcher SIGIR 2009) —
    * the standard RAG retrieval shape. RRF contribution per list is
    * round(10⁶/(60+rank)) in integer micro-units: one deterministic
    * double division per rank (no accumulation), so fused scores are
    * engine-exact; docs in one pool only keep that pool's contribution.
    *
    * Scale shape: both pools are TakeOrdered top-poolK (bounded heaps, no
    * full sort); the rank windows and the fusion join run over ≤poolK
    * rows each — driver-bounded frames, not corpus shuffles.
    */
  def hybridTopK(docs: DataFrame, emb: DataFrame, idCol: String,
                 textCol: String, vecIdCol: String, vecCol: String,
                 terms: Seq[String], queryVecId: Long, k: Int,
                 poolK: Int = 25): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.VectorExprs.register(spark)
    import org.apache.spark.sql.expressions.Window
    val kw = bm25TopK(docs, idCol, textCol, terms, poolK)
      .select(col(idCol).as("id"), col("score_bp"))
      .withColumn("kw_rank",
        row_number().over(Window.orderBy(col("score_bp").desc, col("id").asc)))
    val qRows = emb.filter(col(vecIdCol) === queryVecId)
      .select(col(vecCol).cast("array<double>")).collect()
    require(qRows.nonEmpty, s"hybridTopK: no row with $vecIdCol == $queryVecId")
    val qRow = qRows(0).getSeq[Double](0).toArray
    val qn = { var s = 0.0; var i = 0; while (i < qRow.length) { s += qRow(i) * qRow(i); i += 1 }; math.sqrt(s) }
    val vec = emb
      .select(col(vecIdCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .filter(col("id") =!= queryVecId) // no self-retrieval in the pool
      .select(col("id"), (graft.functions.VectorExprs.dot(col("v"), lit(qRow)) /
        (graft.functions.VectorExprs.norm(col("v")) * lit(qn))).as("cos"))
      .orderBy(col("cos").desc, col("id").asc).limit(poolK)
      .withColumn("vec_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("id").asc)))
    def rrf(r: Column): Column =
      round(lit(1e6) / (lit(60.0) + r.cast(DoubleType))).cast(LongType)
    kw.select(col("id"), col("kw_rank"))
      .join(vec.select(col("id"), col("vec_rank")), Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(rrf(col("kw_rank")), lit(0L)) + coalesce(rrf(col("vec_rank")), lit(0L))).as("rrf_micro"),
        col("kw_rank"), col("vec_rank"))
      .orderBy(col("rrf_micro").desc, col("id").asc).limit(k)
  }

  /** Per-document term-frequency vector for a fixed vocabulary — the
    * dense feature extraction for downstream classifiers. Pure expression:
    * zero shuffles, one pass.
    */
  def termVector(docs: DataFrame, idCol: String, textCol: String,
                 vocab: Seq[String]): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val cols = vocab.map(t =>
      size(filter(toks, x => x === t)).cast(LongType).as(s"tf_$t"))
    docs.select((col(idCol) +: cols): _*)
  }
}
