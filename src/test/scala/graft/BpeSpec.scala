package graft

import org.apache.spark.sql.functions._

/** BPE merge training: hand-computed pair statistics, deterministic
  * tie-breaks, and the left-to-right non-overlapping merge application
  * (the "aaaa" case) — the properties the DuckDB oracle replay relies on.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns merges by max pair count with deterministic application") {
    // corpus: "aaab aaab ab" → vocab {aaab: 2, ab: 1}
    // step 1: (a,a)=4 beats (a,b)=3 → merge (a,a); aaab→[aa,a,b]
    // step 2: (a,b)=2+1=3 beats (aa,a)=2 → merge (a,b); aaab→[aa,ab], ab→[ab]
    // step 3: (aa,ab)=2 is the only pair left
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = ext.Bpe.trainMerges(docs, "text", 3)
      .orderBy("merge_rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)))
  }

  test("merge application is left-to-right non-overlapping (aaaa -> [aa][aa])") {
    // "aaaa": (a,a) appears 3 times (overlapping adjacency) but applying
    // the merge must produce [aa, aa], so step 2's top pair is (aa, aa)
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = ext.Bpe.trainMerges(docs, "text", 2)
      .orderBy("merge_rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("ties break lexicographically on (l, r)") {
    // "dc ba": pairs (d,c)=1 and (b,a)=1 — (b,a) must win the tie
    val docs = Seq((1L, "dc ba")).toDF("doc_id", "text")
    val first = ext.Bpe.trainMerges(docs, "text", 1).collect()(0)
    assert((first.getString(1), first.getString(2)) == ("b", "a"))
  }
}
