package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical language-model quality scoring — the CCNet/Gopher-style
  * "perplexity filter" used to rank web documents for LLM training data:
  * train a word-bigram model with add-k smoothing on a deterministic
  * hash-split of the corpus, then score EVERY document by its total
  * negative log-likelihood under that model. Low NLL-per-bigram ≈ fluent,
  * in-distribution text; high ≈ boilerplate/garbage (filter or down-mix).
  *
  * Model: p(w2|w1) = (c(w1,w2) + k) / (c1(w1) + k·V), where c1 is the
  * HISTORY count (occurrences of w1 as a bigram prefix — so the
  * conditional normalizes) and V the training vocabulary size. Unseen
  * histories degrade to the uniform 1/V.
  *
  * Scale shape (100 TB):
  *  - training counts are plain mergeable aggregates (map-side combined);
  *    the train split is a hash filter, not a shuffle;
  *  - scoring JOINS doc bigrams to the model on the bigram key instead of
  *    broadcasting it — an n-gram model over a web corpus is itself huge
  *    (|bigrams| ~ corpus size), so the model is dataframe-shaped state,
  *    never driver/broadcast state; AQE will still broadcast it when a
  *    small corpus makes it small;
  *  - V and the doc re-attach are one scalar crossjoin + one left join.
  *
  * Determinism (driver hash-compares): ln() can differ by 1 ulp across
  * math libraries and float sums are accumulation-order-dependent, so
  * per-bigram terms are FIXED-POINTED (round(-ln(p)·10⁶) as long — terms
  * are non-negative since p <= 1, keeping round() half-up identical
  * across engines) and summed as integers: order-free, bit-exact.
  * LangModelSpec asserts every term's distance from a rounding boundary
  * is far beyond 1 ulp of ln on this corpus.
  */
object LangModel {

  /** Per-document (n_bigrams, nll_micro): count of scored bigrams and the
    * integer sum of round(-ln p · 10⁶) over them. Documents with fewer
    * than 2 tokens score (0, 0).
    */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                trainFraction: Double = 0.5, k: Double = 0.5): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("toks"))

    def bigrams(df: DataFrame): DataFrame = df
      .filter(size(col("toks")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

    val train = toks.join(
      Sampling.hashSample(docs.select(col(idCol).as("id")), col("id"), trainFraction),
      "id")
    val trainBg = bigrams(train)
    val c12 = trainBg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = trainBg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = train.select(explode(col("toks")).as("t"))
      .agg(greatest(countDistinct(col("t")).cast(DoubleType), lit(1.0)).as("vsz"))

    val p = (coalesce(col("c12"), lit(0L)).cast(DoubleType) + k) /
      (coalesce(col("c1"), lit(0L)).cast(DoubleType) + lit(k) * col("vsz"))
    val scored = bigrams(toks)
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("id"), round(-log(p) * 1e6).cast(LongType).as("m"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("m")).as("nll_micro"))

    docs.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"))
  }

  /** Multinomial Naive Bayes domain/source classifier — the "quality
    * classifier" shape of a training-data pipeline (fastText-style
    * corpus filtering): class priors and add-one token likelihoods are
    * trained on a deterministic hash-half of the corpus, and every doc
    * is scored with the summed negative log-likelihood per class in
    * integer MICRO-NATS (round(-ln p · 10⁶) per term), so per-doc sums
    * are order-free and engine-exact; the prediction is the argmin-NLL
    * class with a lexicographic tie-break — a pure function of the data.
    *
    * Scale shape: model state is (vocab × classes) counts — a keyed
    * (w, cls) join the optimizer broadcasts when small; per-doc scoring
    * work is tokens × |classes| with the tiny class/prior/vocab frames
    * broadcast; the argmin window partitions by doc (|classes| rows
    * each), never globally.
    */
  /** Trained NBC model state: per-class priors, the (cls, w) likelihood
    * term table, and the per-class unseen-word default — each in integer
    * micro-nats and localCheckpoint-materialized, so a long-running
    * consumer (a streaming scorer's micro-batches) reads fixed state
    * instead of re-deriving the model per action.
    */
  final case class NbModel(pr: DataFrame, mt: DataFrame, m0: DataFrame)

  def naiveBayesModel(docs: DataFrame, idCol: String, textCol: String,
                      classCol: String,
                      trainFraction: Double = 0.5): NbModel = {
    val toks = docs.select(col(idCol).as("id"), col(classCol).as("cls"),
      Dedup.tokens(col(textCol)).as("toks"))
    val train = toks.join(
      Sampling.hashSample(docs.select(col(idCol).as("id")), col("id"), trainFraction),
      "id")
    val pri0 = train.groupBy("cls").agg(count(lit(1)).as("nd"))
    val tot = pri0.agg(sum(col("nd")).as("n"))
    val pr = pri0.crossJoin(broadcast(tot))
      .select(col("cls"),
        round(-log(col("nd").cast(DoubleType) / col("n").cast(DoubleType)) * 1e6)
          .cast(LongType).as("prior_micro"))
    val tw = train.select(col("cls"), explode(col("toks")).as("w"))
    val cw = tw.groupBy("cls", "w").agg(count(lit(1)).as("cwc"))
    val tc = tw.groupBy("cls").agg(count(lit(1)).as("totc"))
    val vocab = tw.agg(countDistinct(col("w")).cast(DoubleType).as("vsz"))
    // the fixed-point likelihood term is a function of (cls, w) only, so
    // it is materialized ONCE on the model table (ln runs |vocab|·|cls|
    // times, never per corpus token), with a per-class default for
    // unseen words (cwc=0 ⇒ the numerator is exactly 1.0 — same IEEE
    // value as the inline coalesce form)
    val mt = cw.join(broadcast(tc), "cls").crossJoin(broadcast(vocab))
      .select(col("cls"), col("w"),
        round(-log((col("cwc").cast(DoubleType) + lit(1.0)) /
          (col("totc").cast(DoubleType) + col("vsz"))) * 1e6)
          .cast(LongType).as("mw"))
    val m0 = tc.crossJoin(broadcast(vocab))
      .select(col("cls"),
        round(-log(lit(1.0) /
          (col("totc").cast(DoubleType) + col("vsz"))) * 1e6)
          .cast(LongType).as("m0"))
    NbModel(pr.localCheckpoint(true), mt.localCheckpoint(true),
      m0.localCheckpoint(true))
  }

  /** Score `docs` (batch OR stream) against a trained model. The plan is
    * stream-legal by construction: token rows and per-doc prior rows
    * union into ONE fused aggregate (functions.ArgminAgg — per-class
    * sums + argmin in a single shuffle / single stateful operator).
    * `dedupTf` pre-aggregates distinct (doc, token) pairs weighted by tf
    * (Σ_occurrences term == Σ_distinct tf·term exactly, the rounding is
    * per-(cls, w)) — an extra aggregation, so batch-only.
    */
  def naiveBayesScore(docs: DataFrame, idCol: String, textCol: String,
                      classCol: String, model: NbModel,
                      dedupTf: Boolean = true): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), col(classCol).as("cls"),
      Dedup.tokens(col(textCol)).as("toks"))
    val exploded = toks.select(col("id"), col("cls").as("cls_truth"),
      explode(col("toks")).as("w"))
    val dt =
      if (dedupTf)
        exploded.groupBy("id", "cls_truth", "w").agg(count(lit(1)).as("tf"))
      else exploded.withColumn("tf", lit(1L))
    val tokRows = dt.crossJoin(broadcast(model.pr.select(col("cls"))))
      .join(model.mt, Seq("cls", "w"), "left")
      .join(broadcast(model.m0), Seq("cls"))
      .select(col("id"), col("cls_truth"), col("cls"),
        (col("tf") * coalesce(col("mw"), col("m0"))).as("m"))
    val priorRows = toks.select(col("id"), col("cls").as("cls_truth"))
      .crossJoin(broadcast(model.pr))
      .select(col("id"), col("cls_truth"), col("cls"),
        col("prior_micro").as("m"))
    tokRows.unionByName(priorRows)
      .groupBy("id")
      .agg(min(col("cls_truth")).as("cls_truth"),
        graft.functions.ArgminAgg.argminSum(col("cls"), col("m")).as("__best__"))
      .select(col("id").as(idCol), col("cls_truth"),
        col("__best__.pred_cls").as("pred_cls"),
        col("__best__.nll_micro").as("nll_micro"))
  }

  /** Multinomial Naive Bayes train + score over one corpus — see
    * naiveBayesModel / naiveBayesScore.
    */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
                 classCol: String, trainFraction: Double = 0.5): DataFrame =
    naiveBayesScore(docs, idCol, textCol, classCol,
      naiveBayesModel(docs, idCol, textCol, classCol, trainFraction))

  /** Collocation extraction by pointwise mutual information:
    * PMI(w1,w2) = ln(c12·N / (c1·c2)) over corpus bigrams, where c1/c2
    * are positional (w1-as-first / w2-as-second) counts and N the total
    * bigram count — the classic Church & Hanks (1990) association
    * measure.
    *
    * Determinism: candidates are pre-filtered by the INTEGER predicate
    * c12·N > c1·c2 (exactly PMI > 0 — no float in the filter), so the
    * fixed-pointed score round(ln·10⁶) only ever rounds non-negative
    * values, the same half-up-stability argument as bigramNll. Ranking
    * ties break on (w1, w2), making the top-k cut exact across engines.
    *
    * Scale shape: two count aggregates over the bigram stream + one
    * total; the c1/c2 joins are on single-word keys (dataframe-sized
    * model state like the LM — AQE broadcasts them when small); the
    * top-k is a |candidates|-row sort AFTER the minCount filter.
    */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Long = 5, topK: Int = 50): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("toks"))
    val bg = toks
      .filter(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val c2 = bg.groupBy("w2").agg(count(lit(1)).as("c2"))
    val n = bg.agg(count(lit(1)).as("nb"))
    c12.filter(col("c12") >= minCount)
      .join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(n))
      // decimal(38) products: c12·N at web scale (N ~ 10¹²) overflows a
      // long; the filter must stay EXACT, not float
      .filter(col("c12").cast("decimal(38,0)") * col("nb") >
        col("c1").cast("decimal(38,0)") * col("c2")) // PMI > 0, exact
      .select(col("w1"), col("w2"), col("c12"),
        round(log((col("c12") * col("nb")).cast(DoubleType) /
          (col("c1") * col("c2")).cast(DoubleType)) * 1e6).cast(LongType).as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
