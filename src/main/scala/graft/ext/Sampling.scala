package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting/packing for training-data pipelines.
  *
  * Everything here is HASH-deterministic, never RNG-based: a row's
  * assignment depends only on its key, so (a) re-runs and retries give
  * byte-identical outputs on any cluster layout, (b) adding data never
  * reshuffles old rows between splits (the property training pipelines
  * actually need: yesterday's val doc must not leak into today's train
  * set), and (c) results are reproducible in any other engine from the
  * same md5 primitive — no Spark-specific `rand(seed)` partition-order
  * dependence.
  *
  * The hash fraction is the first 8 hex chars of md5(key) compared
  * lexicographically against fixed-width hex thresholds — exact decimal
  * fractions in 16⁸ resolution, no floating point anywhere.
  */
object Sampling {

  /** Uniform hash fraction in [0, 16^8) as an 8-hex-char string. */
  private def hexFrac(key: Column): Column = substring(md5(key.cast("string")), 1, 8)

  private def hexThreshold(fraction: Double): String =
    f"${math.round(fraction * (1L << 32)).min((1L << 32) - 1).max(0L)}%08x"

  /** Keep-predicate for one fraction. Fractions at the ends short-circuit
    * to constants: the strict `< threshold` compare caps at 0xffffffff, so
    * fraction 1.0 would otherwise silently drop keys whose first 8 md5 hex
    * chars are exactly "ffffffff" (~1 in 4.3B rows — invisible in tests,
    * real at 100 TB row counts).
    */
  private def keepFraction(frac: Column, fraction: Double): Column =
    if (fraction >= 1.0) lit(true)
    else if (fraction <= 0.0) lit(false)
    else frac < lit(hexThreshold(fraction))

  /** Label each row train/val/test (or any split map) by hash of `key`.
    * Fractions must sum to ≤ 1; remainder falls into the LAST split.
    * Splits are assigned by cumulative hash ranges, so growing one split's
    * fraction only MOVES the boundary — rows never swap between two
    * non-adjacent splits on a fraction change.
    */
  def hashSplit(df: DataFrame, key: Column,
                splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must sum to <= 1")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val frac = hexFrac(key)
    val labeled = splits.init.zip(cum.init).foldLeft(when(lit(false), lit(""))) {
      case (acc, ((name, _), cumFrac)) =>
        acc.when(keepFraction(frac, cumFrac), name)
    }.otherwise(splits.last._1)
    df.withColumn(outCol, labeled)
  }

  /** Keep a deterministic `fraction` of rows, uniformly by hash of `key`.
    * Unlike `df.sample`, membership is a pure function of the key: stable
    * across runs, cluster layouts, and data growth.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(keepFraction(hexFrac(key), fraction))

  /** Per-stratum deterministic sampling: keep `fraction` of each stratum
    * (e.g. per-language quotas). One codegen'd filter — no groupBy, no
    * shuffle, no per-stratum scans; the stratum column only diversifies
    * the hash so strata sample independently.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       fraction: Double): DataFrame =
    df.where(keepFraction(
      hexFrac(concat(stratum.cast("string"), lit(":"), key.cast("string"))), fraction))

  /** Per-stratum fractions (e.g. up-sample rare languages): unlisted
    * strata keep `default`.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       fractions: Map[String, Double], default: Double): DataFrame = {
    val frac = hexFrac(concat(stratum.cast("string"), lit(":"), key.cast("string")))
    val keep = fractions.foldLeft(when(lit(false), lit(false))) {
      case (acc, (s, f)) => acc.when(stratum === lit(s), keepFraction(frac, f))
    }.otherwise(keepFraction(frac, default))
    df.where(keep)
  }

  /** Deterministic quota sample: exactly `n` rows per stratum (fewer if
    * the stratum is smaller), chosen by md5 order — a reproducible
    * "n examples per language/source" picker. One shuffle on the stratum
    * key; the rank window is bounded per stratum.
    */
  def sampleNPerStratum(df: DataFrame, stratum: Column, key: Column,
                        n: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("__rn__", row_number().over(w))
      .where(col("__rn__") <= n)
      .drop("__rn__")
  }

  /** Sequence packing, chunked-concatenation semantics (the standard
    * pretraining shape: token streams are concatenated in a deterministic
    * order and chunked into fixed `binTokens` context windows; documents
    * MAY straddle a window boundary). Packing runs INDEPENDENTLY per
    * shard (`shardCol`) — the window cumsum parallelizes across shards, so
    * no global single-partition sort exists at any scale; window identity
    * is (shard, bin).
    *
    * Returns the input plus `bin` (window index of the doc's first token,
    * 0-based within shard), `bin_offset` (token offset inside that
    * window), and `n_bins` (how many windows the doc spans). Integer
    * arithmetic only — exactly reproducible in any engine.
    *
    * For the no-straddle variant (pad at the boundary instead of
    * splitting the doc) see [[packGreedy]]: that placement is a
    * sequential recurrence, not a window closed form.
    */
  def packSequences(df: DataFrame, shardCol: Column, orderCol: Column,
                    tokenCol: Column, binTokens: Int): DataFrame = {
    require(binTokens > 0, "binTokens must be positive")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
    val cumBefore = coalesce(sum(tokenCol).over(
      w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val b = lit(binTokens.toLong)
    df.withColumn("bin", floor(cumBefore / b).cast("long"))
      .withColumn("bin_offset", (cumBefore % b).cast("long"))
      .withColumn("n_bins",
        (floor((cumBefore + greatest(tokenCol.cast("long"), lit(1L)) - 1) / b)
          - floor(cumBefore / b) + 1).cast("long"))
  }

  /** True greedy packing (no-straddle): a document that would cross a
    * window boundary starts at the next boundary instead (the skipped
    * tail is padding). The placement is a sequential recurrence — each
    * doc's start depends on every previous placement including padding —
    * so it cannot be a window closed form; it streams per shard through
    * `flatMapSortedGroups` (one ordered pass per shard, shards in
    * parallel, O(1) state — the Spark-native shape for order-dependent
    * per-group scans). Docs larger than `binTokens` start on a boundary
    * and span consecutive windows; the next doc packs right after.
    *
    * Returns (shard, order, bin, bin_offset) with the caller's shard and
    * order values, castable back for joining to the full row set.
    */
  def packGreedy(df: DataFrame, shardCol: Column, orderCol: Column,
                 tokenCol: Column, binTokens: Int): DataFrame = {
    require(binTokens > 0, "binTokens must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val b = binTokens.toLong
    df.select(shardCol.cast("string").as("shard"),
        orderCol.cast("long").as("ord"), tokenCol.cast("long").as("tok"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ord")) { (shard, rows) =>
        var pos = 0L
        rows.map { case (_, ord, tok) =>
          val t = math.max(tok, 1L)
          val start =
            if (pos / b == (pos + t - 1) / b) pos
            else ((pos + b - 1) / b) * b
          pos = start + t
          (shard, ord, start / b, start % b)
        }
      }
      .toDF("shard", "ord", "bin", "bin_offset")
  }

  /** Weighted sampling WITHOUT replacement (top-k by exponential keys —
    * Efraimidis & Spirakis, IPL 2006): row i is kept iff its key
    * -ln(uᵢ)/wᵢ is among the k smallest, which draws exactly k rows with
    * inclusion probability proportional to weight. The workhorse for
    * "sample 10M docs, longer docs proportionally more" training-mix
    * draws.
    *
    * Engine-exact determinism, in three steps: uᵢ comes from the first 8
    * md5 hex chars of the id ((h+0.5)/2³² — the same deterministic
    * uniform the hash-split family uses); -ln(u) is FIXED-POINTED to
    * micro-nats (non-negative, so round() half-up agrees across
    * engines); and the only float op after that is ONE IEEE division
    * nl_micro/w, bit-identical everywhere. Ties break on id, so the
    * top-k cut is exact and the driver hash-matches it.
    *
    * Scale shape: one map pass + TakeOrderedAndProject (per-partition
    * bounded heaps, k rows shuffled per partition — never a global sort).
    */
  def weightedSampleK(df: DataFrame, idCol: String, weight: Column,
                      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
    val nl = round(-log((h.cast("double") + 0.5) / 4294967296.0) * 1e6).cast("long")
    df.withColumn("__w__", weight.cast("long"))
      .filter(col("__w__") > 0)
      .withColumn("nl_micro", nl)
      .withColumn("wkey", col("nl_micro").cast("double") / col("__w__"))
      .orderBy(col("wkey").asc, col(idCol).asc)
      .limit(k)
      .drop("__w__")
  }

  /** Exact integer apportionment of a row budget across groups by the
    * largest-remainder (Hamilton) method: base quota = ⌊budget·nᵢ/N⌋,
    * then the leftover seats go to the largest remainders (ties by key
    * asc). Σ quota == budget exactly — the allocator behind proportional
    * source mixing when "multiply by a fraction and round" must not
    * over- or under-shoot the token budget.
    *
    * Scale shape: one hash aggregation to group counts; every window
    * below runs over the #groups-row frame (sources/domains — thousands
    * at most), never over the corpus.
    */
  def apportion(df: DataFrame, keyCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .withColumn("__tot__", sum(col("n")).over(all))
      // DECIMAL(38,0) product: budget·n overflows BIGINT for the trillion
      // -token budgets this is for; integral div of decimals returns LONG
      .withColumn("__base__", expr(s"(CAST($budget AS DECIMAL(38,0)) * n) div __tot__"))
      .withColumn("__rem__", expr(s"(CAST($budget AS DECIMAL(38,0)) * n) % __tot__"))
      .withColumn("__rk__", row_number().over(
        Window.orderBy(col("__rem__").desc, col(keyCol).asc)))
      .withColumn("__left__", lit(budget) - sum(col("__base__")).over(all))
      .withColumn("quota",
        col("__base__") + when(col("__rk__") <= col("__left__"), 1L).otherwise(0L))
      .select(col(keyCol), col("n"), col("quota"))
  }

  /** DSIR-style data selection (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023 — public method):
    * documents are scored by hashed-n-gram importance log-ratios between
    * a TARGET domain and the RAW corpus, and the top-k by weight are
    * selected. Features are word uni+bigrams hashed into `buckets` md5
    * buckets (deterministic, replayable in any engine); both
    * distributions are add-one smoothed; a doc's weight is the
    * tf-weighted integer micro-nat sum of per-bucket log ratios —
    * order-free and engine-exact (this is the deterministic
    * rank-by-weight variant of the paper's Gumbel-top-k sampling).
    *
    * Scale shape: the model is ≤`buckets` counters with their log-ratio
    * table (broadcast-sized); scoring is one explode + a keyed (bucket)
    * join + a per-doc sum; selection is the bounded-heap TopKAgg — no
    * global sort anywhere.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 targetPred: Column, buckets: Int = 4096,
                 k: Int = 100): DataFrame = {
    require(buckets >= 2 && k >= 1, "dsirSelect: buckets >= 2, k >= 1")
    // Par.fanOut: the uni+bigram explode + md5 is the expensive pass and
    // must not inherit a sub-split file's single scan partition (r12
    // ProbeJobs: 6.3 s single-task checkpoint stage); no-op at natural
    // parallelism
    val grams = Par.fanOut(docs).select(col(idCol).as("id"), targetPred.as("is_t"),
        explode(concat(Dedup.tokens(col(textCol)),
          Dedup.wordNgrams(col(textCol), 2))).as("g"))
      .select(col("id"), col("is_t"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % buckets).as("b"))
      // materialize ONCE: the bucket-count pass and the per-doc tf pass
      // both read this frame — without the checkpoint the tokenize +
      // md5-per-gram explode (the expensive part) runs twice
      .localCheckpoint(true)
    val c = grams.groupBy("b").agg(count(lit(1)).as("cr"),
      count(when(col("is_t"), lit(1))).as("ct"))
    val tot = c.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val bD = lit(buckets.toDouble)
    val lr = c.crossJoin(broadcast(tot)).select(col("b"),
      round(log(((col("ct").cast("double") + lit(1.0)) / (col("tt").cast("double") + bD)) /
        ((col("cr").cast("double") + lit(1.0)) / (col("tr").cast("double") + bD))) * 1e6)
        .cast("long").as("lr"))
    val dg = grams.groupBy("id", "b").agg(count(lit(1)).as("tf"))
    val w = dg.join(lr, "b").groupBy("id")
      .agg(sum(col("tf") * col("lr")).as("weight_micro"))
    // weights stay far below 2^53 (|lr| ≤ ln(buckets·smoothing)·10⁶ ≈ 10⁷
    // per gram), so the double-keyed heap compares them exactly
    w.agg(graft.functions.TopKAgg.topK(k, col("weight_micro").cast("double"),
        col("id").cast("double"), struct(col("id"), col("weight_micro"))).as("__top__"))
      .select(posexplode(col("__top__")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol), col("col.weight_micro").as("weight_micro"))
  }
}
