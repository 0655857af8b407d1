package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EXACT fuzzy string join (record linkage): all pairs within a
  * Levenshtein edit-distance threshold, WITHOUT the O(n·m) all-pairs
  * comparison — deletion-neighborhood blocking (the SymSpell / symmetric-
  * delete scheme, Garbe 2012; same family as Mor-Fraenkel 1982): two
  * strings with ed(s,t) <= d always share at least one member of their
  * <=d-deletion neighborhoods. Proof for d=1: a substitution at i makes
  * both 1-deletions at i equal; an insertion makes the original s itself
  * a member of t's 1-deletion set. Inductively extends to d deletions.
  * Candidates from the neighborhood equi-join are verified with the exact
  * levenshtein() — so the output provably equals the naive theta join,
  * and the driver hash-compares it against a DuckDB cross-join oracle.
  *
  * Scale shape (100 TB):
  *  - the neighborhood explode is bounded: (len+1) variants at d=1,
  *    O(len²) at d=2 — emitted directly as int64 HASHES by the native
  *    DeletionHashesExpr (no variant string is ever materialized);
  *  - the candidate shuffle carries (hash, id) pairs only — variant
  *    STRINGS never exist; hash collisions only ever ADD
  *    candidates, which the exact verification filter removes;
  *  - verification re-joins the two bounded candidate id sets to their
  *    strings: cost linear in candidates, not in the cross product.
  */
object FuzzyJoin {

  import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}

  /** Hashes of the ≤d-deletion neighborhood of `s` (block key folded into
    * the seed) — the native [[graft.functions.DeletionHashesExpr]]: no
    * variant string is ever materialized; the earlier nested
    * transform∘transform + array_distinct form spent the whole join's
    * budget building O(len²) UTF8Strings per row through Catalyst
    * lambdas.
    */
  private def neighborhoodHashes(s: Column, blk: Column, d: Int): Column = {
    require(d >= 0 && d <= 2,
      "editDistanceJoin supports maxDist 0..2 (neighborhood size is O(len^d))")
    toCol(graft.functions.DeletionHashesExpr(toExpr(s), toExpr(blk), d))
  }

  /** Self-join: all pairs (id_a < id_b) with
    * levenshtein(str_a, str_b) <= maxDist.
    * Output: (id_a, id_b, str_a, str_b, dist).
    */
  def editDistanceSelfJoin(df: DataFrame, idCol: String, strCol: String,
                           maxDist: Int, blockCol: Option[String] = None): DataFrame = {
    // optional blocking key: folded into the candidate hash (so the
    // quadratic levenshtein stage is bounded PER BLOCK, not globally)
    // and re-checked exactly in the verify stage (a cross-block hash
    // collision can only ADD candidates, never pairs)
    // Par.fanOut: the per-row deletion-neighborhood hashing below is the
    // CPU kernel and must not inherit a sub-split file's single scan
    // partition (no-op at natural parallelism). The isNotNull filter is
    // over a RAW column, so its pushdown below the exchange is harmless.
    val base = Par.fanOut((blockCol match {
      case Some(c) => df.select(col(idCol).as("id"), col(strCol).as("s"),
        col(c).cast("string").as("blk"))
      case None => df.select(col(idCol).as("id"), col(strCol).as("s"),
        lit("").as("blk"))
    }).filter(col("s").isNotNull))
    // ids-only blocking: hash every neighborhood variant (+ block key)
    // natively. NULL block keys get a sentinel seed so null-block rows
    // never share candidate hashes with real blocks; the verify filter is
    // null-safe (<=>), so null blocks match each other (NULL is its own
    // block) — same behavior as blockCol = None for non-null keys.
    val blocks = base.select(col("id"),
      explode(neighborhoodHashes(col("s"),
        coalesce(col("blk"), lit("\u0000<null-block>")), maxDist)).as("h"))
      .distinct() // repeated variants dedupe as (id, long) pairs
      // materialize ONCE: both sides of the self-join read this frame —
      // without the checkpoint Spark plans the explode+hash+distinct
      // twice and broadcasts one full copy as a multi-million-row build
      // side; with it the join is a co-partitioned shuffle on h
      .localCheckpoint(true)
    // user-pinned width for the candidate join: the checkpointed frame
    // carries no recognized partitioning, so the join re-shuffles both
    // sides by h — ids-only rows that AQE byte-coalesces to a handful of
    // partitions, serializing the pair generation + partial distinct
    // (r12 ProbeJobs: 7.4 s of task time through 8 partitions in
    // er_bcubed). HashPartitioning(h, n) satisfies both join sides, so
    // this ONE exchange replaces the two coalescible ones. fanOutPairs on
    // the distinct candidates keeps the per-pair levenshtein verify at
    // cluster width (same pattern as the similarity joins).
    val blocksW = blocks.repartition(
      blocks.sparkSession.sparkContext.defaultParallelism, col("h"))
    val cands = Par.fanOutPairs(
      blocksW.as("a").join(blocksW.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct(), Seq("id_a", "id_b"))
    cands
      .join(base.select(col("id").as("id_a"), col("s").as("str_a"), col("blk").as("__blka__")), "id_a")
      .join(base.select(col("id").as("id_b"), col("s").as("str_b"), col("blk").as("__blkb__")), "id_b")
      .filter(col("__blka__") <=> col("__blkb__"))
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")).cast(LongType))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"), col("dist"))
  }
}
