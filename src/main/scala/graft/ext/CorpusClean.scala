package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus curation for LLM training data, C4/Gopher-style: cross-document
  * span dedup, within-document repetition signals, and PII redaction.
  *
  * The reference engine (Antix5/OpenETLAgent) has no corpus surface; these
  * are the operations a production pretraining pipeline layers on top, built
  * so every output is either an exact string or an exact integer — which is
  * what makes them verifiable against an external engine bit-for-bit.
  *
  * Scale shapes (100 TB):
  *  - c4Dedup shuffles document text exactly twice (the global keep-one
  *    window and the per-document reassembly), both on keys with natural
  *    parallelism (span text hash, doc id). No self-join, no cartesian.
  *  - repetitionStats touches the corpus once; the only shuffle carries
  *    (doc_id, gram) pairs with map-side partial aggregation.
  *  - redactPii is a pure projection — zero shuffles.
  */
object CorpusClean {

  /** Fixed-width token segments ("spans"): tokens chunked in groups of
    * `segTokens`, the last segment ragged. The C4 dedup unit is the
    * three-sentence span; this corpus has no sentence boundaries, so the
    * span is a fixed token window — same algorithm, deterministic
    * segmentation that any engine reproduces from integer arithmetic.
    */
  def segments(text: Column, segTokens: Int): Column = {
    require(segTokens > 0, "segments: segTokens must be positive")
    val toks = Dedup.tokens(text)
    val nSeg = ceil(size(toks).cast(DoubleType) / segTokens).cast(IntegerType)
    when(size(toks) > 0,
      transform(sequence(lit(0), nSeg - 1),
        i => concat_ws(" ", slice(toks, i * segTokens + 1, lit(segTokens)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** C4-style cross-document span dedup: every duplicated span keeps only
    * its globally-first occurrence (min (doc_id, seg_idx) order), all other
    * occurrences are cut; each document is reassembled from its surviving
    * spans in order. Documents whose every span was cut survive with
    * `text_clean = ""` — dropping them is the caller's policy decision.
    *
    * One row_number window partitioned by the span text picks keepers
    * (Spark hash-partitions the string key — the 100 TB shuffle is spread
    * over #distinct-spans); one groupBy(doc) reassembles. collect_list is
    * order-unstable under parallel merge, so spans are collected as
    * (seg_idx, seg) structs and array_sort'ed before joining — fully
    * deterministic.
    */
  def c4Dedup(df: DataFrame, idCol: String, textCol: String,
              segTokens: Int = 10): DataFrame = {
    val base = Par.fanOut(df)
      .select(col(idCol), segments(col(textCol), segTokens).as("__segs__"))
    val segs = base.select(col(idCol),
      posexplode(col("__segs__")).as(Seq("seg_idx", "seg")))
    val keeper = Window.partitionBy(col("seg"))
      .orderBy(col(idCol), col("seg_idx"))
    val kept = segs.withColumn("__rn__", row_number().over(keeper))
      .filter(col("__rn__") === 1)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_seg_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            s => s.getField("seg")), " ").as("text_clean"))
    base.select(col(idCol), size(col("__segs__")).cast(LongType).as("n_seg"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_seg"),
        coalesce(col("n_seg_kept"), lit(0L)).as("n_seg_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Within-document repetition signals (Gopher-rule shape), all exact
    * integers so the quality thresholds downstream are reproducible:
    *  - n_seg / n_seg_distinct: duplicate-span fraction numerator pair
    *  - n_gram2 / top_gram2_n: fraction of bigrams claimed by the most
    *    repeated bigram (word-salad and boilerplate both light this up)
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      segTokens: Int = 10): DataFrame = {
    // top bigram multiplicity == longest equal-run in the SORTED per-row
    // bigram array — a pure expression, so the whole statistic is one
    // map-only pass. The groupBy(doc, gram) formulation shuffled every
    // bigram STRING of the corpus for a per-document number (measured
    // 8 s → ~0.3 s at sf0.1).
    val sorted = sort_array(Dedup.wordNgrams(col(textCol), 2))
    val topRun = aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    Par.fanOut(df).select(col(idCol),
      segments(col(textCol), segTokens).as("__segs__"),
      Dedup.wordNgrams(col(textCol), 2).as("__g2__"),
      topRun.as("top_gram2_n"))
      .select(col(idCol),
        size(col("__segs__")).cast(LongType).as("n_seg"),
        size(array_distinct(col("__segs__"))).cast(LongType).as("n_seg_distinct"),
        coalesce(size(col("__g2__")), lit(0)).cast(LongType).as("n_gram2"),
        col("top_gram2_n"))
  }

  // RE2-compatible PII patterns (no backrefs, no lookaround) so the same
  // pattern text runs identically under Java regex and RE2-family engines.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val ipRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Redact emails, then phone numbers, then IPv4 literals — fixed order,
    * so a phone inside an email is consumed by the email pass first.
    * Pure projection: zero shuffles, codegen'd regexp_replace.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipRe, "<IP>")

  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(emailRe)).cast(LongType),
      regexp_count(text, lit(phoneRe)).cast(LongType),
      regexp_count(text, lit(ipRe)).cast(LongType))

  /** Markup → text extraction (the CommonCrawl WET step every web corpus
    * needs before any quality scoring): drop script/style blocks wholesale
    * (their content is code, not prose), strip remaining tags, decode the
    * core HTML entities, collapse whitespace. Pure projection — zero
    * shuffles, codegen'd regexp_replace chain.
    *
    * All patterns are RE2-compatible (non-greedy + (?s), no backrefs, no
    * lookaround) so the identical pattern text runs under Java regex and
    * RE2-family engines — which is what lets the driver oracle replicate
    * this byte-for-byte in DuckDB.
    */
  val scriptBlockRe = "(?s)<(script|style)[^>]*>.*?</(script|style)>"
  val tagRe = "<[^>]+>"

  def stripMarkup(html: Column): Column = {
    val noBlocks = regexp_replace(html, scriptBlockRe, " ")
    val noTags = regexp_replace(noBlocks, tagRe, " ")
    // entity names are regex-metacharacter-free, so they run as literal
    // patterns in both engines (\Q\E quoting would break RE2)
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&") // amp LAST (double-escapes)
      .foldLeft(noTags) { case (c, (from, to)) => regexp_replace(c, from, to) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Benchmark decontamination: flag every corpus document sharing at least
    * one word `n`-gram with the (small) benchmark set.
    *
    * Scale shape: benchmark grams are distinct'ed and BROADCAST; corpus
    * gram arrays are built per-row and left-semi joined against the
    * broadcast — the corpus text itself never shuffles. The only shuffle
    * is the ids-only per-doc hit count. This is the standard contamination
    * sweep (e.g. GPT-3 appendix C / PaLM-style 8-gram overlap) as one
    * broadcast join.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.wordNgrams(col(textCol), n)).as("g")).distinct()
    val hits = Par.fanOut(corpus)
      .select(col(idCol), explode(Dedup.wordNgrams(col(textCol), n)).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }
}
