package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
    // NOT fanned out: plain whitespace tokenize is too cheap here — the
    // r12 A/B measured the extra exchange + 32-task scheduling LOSING
    // across the whole bigram family (ta_perplexity 1.29->1.55 s, ta_pmi
    // 0.58->1.12 s with fanOut); the md5/ngram kernels elsewhere are
    // where fanOut pays
    val toks = docs
      .select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("toks"))

    // no size>=2 filter: pushdown would substitute the alias and evaluate
    // tokenize below fanOut's exchange (single-task scan stage) — the
    // clamped slice makes <2-token docs yield an empty zip (explode drops
    // them), which is exactly what the filter did
    def bigrams(df: DataFrame): DataFrame = df
      .select(col("id"), explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
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
    // not fanned out — see bigramNll (cheap tokenize; fanOut measured a
    // net loss on ta_nbc 2.15->3.33 s)
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
    // not fanned out — see bigramNll (cheap tokenize)
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
    // clamped slice instead of a size>=2 filter; not fanned out — see
    // bigramNll (cheap tokenize)
    val toks = docs
      .select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("toks"))
    val bg = toks
      .select(explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
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

  /** The bigram stream (w1, w2) shared by [[collocations]],
    * [[dunningCollocations]] and [[kneserNeyBigrams]].
    */
  private def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // clamped slice instead of a size>=2 filter; not fanned out — see
    // bigramNll (cheap tokenize)
    docs.select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("toks"))
      .select(explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Collocations by Dunning's log-likelihood ratio (Dunning 1993) — the
    * G² statistic over each bigram's 2×2 contingency table (k11 = c12,
    * k12 = c1−c12, k21 = c2−c12, k22 = N−c1−c2+c12), the classic
    * low-count-robust alternative to PMI (which over-rewards rare
    * pairs). Each G² term k·ln(k·N/(R·C)) multiplies its integer counts
    * in DECIMAL(38,0) BEFORE the double cast (k·N at web scale overflows
    * int64) and the four terms sum in fixed textual order, so the
    * micro-rounded score is engine-exact. Zero cells contribute zero
    * (the lim x→0 x·ln x = 0 convention).
    *
    * Scale shape identical to [[collocations]]: two word-keyed count
    * aggregates + one total, then a |candidates|-row ranking after the
    * minCount filter.
    */
  def dunningCollocations(docs: DataFrame, idCol: String, textCol: String,
                          minCount: Long = 5, topK: Int = 25): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val c2 = bg.groupBy("w2").agg(count(lit(1)).as("c2"))
    val n = bg.agg(count(lit(1)).as("nb"))
    def term(k: Column, r: Column, c: Column): Column = {
      val arg = (k.cast("decimal(38,0)") * col("nb")).cast(DoubleType) /
        (r.cast("decimal(38,0)") * c).cast(DoubleType)
      when(k > 0, k.cast(DoubleType) * log(arg)).otherwise(lit(0.0))
    }
    c12.filter(col("c12") >= minCount)
      .join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(n))
      .withColumn("k12", col("c1") - col("c12"))
      .withColumn("k21", col("c2") - col("c12"))
      .withColumn("k22", col("nb") - col("c1") - col("c2") + col("c12"))
      .select(col("w1"), col("w2"), col("c12"),
        round((term(col("c12"), col("c1"), col("c2")) +
          term(col("k12"), col("c1"), col("nb") - col("c2")) +
          term(col("k21"), col("nb") - col("c1"), col("c2")) +
          term(col("k22"), col("nb") - col("c1"), col("nb") - col("c2"))) * 2.0
          * 1e6).cast(LongType).as("g2_micro"))
      .orderBy(col("g2_micro").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman 1999) for the corpus's top-`topK` bigrams:
    * P(w2|w1) = (c12 − d)/c1 + (d·N1₊(w1·)/c1) · (N1₊(·w2)/T), d = 0.75
    * — the continuation-count smoothing behind every production n-gram
    * LM. Novelty of a word (how many distinct contexts it follows)
    * replaces its raw frequency in the backoff, which is exactly the
    * statistic a dedup'd training corpus wants. All counts are integer
    * aggregates (two keyed counts + two distinct-counts + one types
    * total); the probability is three double ops in fixed order,
    * micro-rounded once. c12 ≥ 1 keeps the discounted numerator
    * positive, so no max() is needed.
    */
  def kneserNeyBigrams(docs: DataFrame, idCol: String, textCol: String,
                       topK: Int = 25): DataFrame = {
    val bg = bigrams(docs, idCol, textCol).localCheckpoint(true) // 3 consumers
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    // the distinct-pair set feeds three continuation aggregates —
    // materialize it ONCE (three wide distincts of the full bigram
    // stream is two passes too many at 100 TB)
    val dis = bg.select("w1", "w2").distinct().localCheckpoint(true)
    val follow = dis.groupBy("w1").agg(count(lit(1)).as("n_follow"))
    val prec = dis.groupBy("w2").agg(count(lit(1)).as("n_prec"))
    val types = dis.agg(count(lit(1)).as("n_types"))
    c12.join(c1, "w1").join(follow, "w1").join(prec, "w2")
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n_follow"), col("n_prec"), col("n_types"),
        round(((col("c12").cast(DoubleType) - 0.75) / col("c1").cast(DoubleType) +
          (lit(0.75) * col("n_follow").cast(DoubleType) / col("c1").cast(DoubleType)) *
            (col("n_prec").cast(DoubleType) / col("n_types").cast(DoubleType)))
          * 1e6).cast(LongType).as("pkn_micro"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
