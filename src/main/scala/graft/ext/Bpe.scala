package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich, Haddow, Birch: "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) — the
  * canonical tokenizer-training pass every LLM data pipeline runs over its
  * corpus. The reference has no tokenizer surface; this joins wordpiece
  * (inference over a given vocab) with the TRAINING side: learn the top-N
  * merge rules from pair statistics.
  *
  * Scale shape (100 TB):
  *  - statistics are WORD-level, so the corpus collapses to its dictionary
  *    (distinct word, freq) before any per-character work — the same
  *    dictionary-encoding trick as wordpieceStats; a web corpus's vocab is
  *    ~10⁸ rows where the corpus is ~10¹² tokens;
  *  - each merge step is ONE partial-aggregated groupBy over adjacent
  *    symbol pairs (vocab-bounded shuffle of (l, r, cnt) triples only)
  *    plus one map pass applying the merge — no step ever shuffles text;
  *  - the argmax collect is a single row per step (the merge decision is
  *    inherently sequential — that IS the BPE algorithm).
  *
  * Merge application is the classic greedy left-to-right non-overlapping
  * scan, expressed as a builtin `aggregate` fold with a look-behind: merge
  * when the accumulator's last symbol is `l` and the current is `r`. The
  * fold IS the classic scan because a just-formed symbol `l||r` is
  * strictly longer than `l` and therefore can never equal it — re-merging
  * into a fresh merge is impossible, so look-behind ≡ look-ahead.
  * Everything is integer counts, binary-UTF8 tie-breaks (cnt desc, l, r),
  * and deterministic folds → every learned merge is bit-identical across
  * engines and exactly replayable by the driver's DuckDB oracle
  * (recursive position-walk per unrolled step).
  */
object Bpe {

  /** The classic greedy merge pass as a builtin fold (see scaladoc). */
  private[ext] def applyMerge(sy: org.apache.spark.sql.Column, l: String, r: String) =
    aggregate(sy, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Dictionary-encode the corpus: (w, freq, sy) with one symbol per
    * character.
    */
  private[ext] def dictionary(docs: DataFrame, textCol: String): DataFrame = docs
    .select(explode(filter(split(lower(col(textCol)), "\\s+"), x => x =!= "")).as("w"))
    .groupBy("w").agg(count(lit(1)).as("freq"))
    .withColumn("sy", filter(split(col("w"), ""), x => x =!= ""))

  /** Learn `nMerges` merges; returns them as ordered (lhs, rhs, count). */
  def learn(docs: DataFrame, textCol: String, nMerges: Int): Seq[(String, String, Long)] = {
    require(nMerges > 0, "nMerges must be positive")
    // dictionary encoding + initial state: every character is a symbol
    val words = dictionary(docs, textCol)
      .localCheckpoint() // every merge step re-reads this — tokenize once
    var state = words
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to nMerges) {
      val best = state
        .where(size(col("sy")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(sy) - 1), i -> named_struct('l', sy[i-1], 'r', sy[i]))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val l = best(0).getString(0); val r = best(0).getString(1)
        merges += ((l, r, best(0).getLong(2)))
        // checkpoint per step: without it, step t re-executes all t prior
        // folds and the nested expression tree grows linearly — the
        // "one shuffle + one map pass per merge" claim requires this.
        // Free the superseded step (eager checkpoint ⇒ prev fully read):
        // a 10k-merge run must hold ONE dictionary, not 10k of them.
        val prev = state
        state = state.withColumn("sy", applyMerge(col("sy"), l, r)).localCheckpoint()
        Ckpt.free(prev)
      }
    }
    Ckpt.free(state) // merges are on the driver — no consumer left
    merges.toSeq
  }

  /** Learn `nMerges` merges over the lowercase whitespace-tokenized
    * corpus. Returns (merge_rank, lhs, rhs, pair_count) — one row per
    * learned merge, in order.
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(docs, textCol, nMerges).zipWithIndex
      .map { case ((l, r, c), i) => (i + 1, l, r, c) }
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** TOKENIZE with learned merges: per-document word and subword counts
    * after applying the merge list in training order to every word — the
    * apply side of the tokenizer lifecycle. Statistics stay
    * dictionary-encoded (merges fold once per DISTINCT word, then per-doc
    * counts re-aggregate), so the per-word fold cost is vocab-bounded
    * exactly like training.
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)]): DataFrame = {
    var prevCkpt: DataFrame = null
    val dict = merges.zipWithIndex.foldLeft(
      dictionary(docs, textCol).select(col("w"), col("sy"))) { case (d, ((l, r), i)) =>
      val next = d.withColumn("sy", applyMerge(col("sy"), l, r))
      // truncate the fold tree every 16 merges: a long merge list would
      // otherwise build one analysis-breaking nested expression. Only the
      // LATEST truncation is live (the chain references nothing older) —
      // free the superseded one so fold depth costs O(1) storage.
      if ((i + 1) % 16 == 0) {
        val ck = next.localCheckpoint()
        Ckpt.freeIfSet(prevCkpt)
        prevCkpt = ck
        ck
      } else next
    }.select(col("w"), size(col("sy")).cast("long").as("n_subwords"))
    docs
      .select(col(idCol),
        explode(filter(split(lower(col(textCol)), "\\s+"), x => x =!= "")).as("w"))
      .join(dict, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_subwords")).as("n_subwords"))
  }
}
