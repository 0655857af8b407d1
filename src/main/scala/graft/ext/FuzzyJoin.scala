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
  *    O(len²) at d=2 — generated as pure codegen'd array expressions;
  *  - the candidate shuffle carries (xxhash64(variant), id) pairs only —
  *    variant STRINGS never shuffle; hash collisions only ever ADD
  *    candidates, which the exact verification filter removes;
  *  - verification re-joins the two bounded candidate id sets to their
  *    strings: cost linear in candidates, not in the cross product.
  */
object FuzzyJoin {

  /** All single-deletion variants of `s`, including `s` itself. */
  private def del1(s: Column): Column = {
    val deletions = transform(sequence(lit(1), length(s)), i =>
      concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    when(length(s) > 0, array_union(array(s), deletions)).otherwise(array(s))
  }

  /** Neighborhood of variants reachable by up to `d` deletions. */
  private def neighborhood(s: Column, d: Int): Column = d match {
    case 0 => array(s)
    case 1 => del1(s)
    case 2 => array_distinct(flatten(transform(del1(s), v => del1(v))))
    case _ => throw new IllegalArgumentException(
      "editDistanceJoin supports maxDist 0..2 (neighborhood size is O(len^d))")
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
    val base = (blockCol match {
      case Some(c) => df.select(col(idCol).as("id"), col(strCol).as("s"),
        col(c).cast("string").as("blk"))
      case None => df.select(col(idCol).as("id"), col(strCol).as("s"),
        lit("").as("blk"))
    }).filter(col("s").isNotNull)
    // ids-only blocking: hash each neighborhood variant (+ block key)
    val blocks = base.select(col("id"), col("blk"),
      explode(neighborhood(col("s"), maxDist)).as("variant"))
      .select(col("id"), xxhash64(col("variant"), col("blk")).as("h"))
    val cands = blocks.as("a").join(blocks.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cands
      .join(base.select(col("id").as("id_a"), col("s").as("str_a"), col("blk").as("__blka__")), "id_a")
      .join(base.select(col("id").as("id_b"), col("s").as("str_b"), col("blk").as("__blkb__")), "id_b")
      .filter(col("__blka__") === col("__blkb__"))
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")).cast(LongType))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"), col("dist"))
  }
}
