package graft

import graft.ext.Search
import org.apache.spark.sql.functions._

/** BM25 ranking: hand-computed scores on a tiny corpus. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "cat dog cat"),       // tf(cat)=2, dl=3
    (2L, "cat fish"),          // tf(cat)=1, dl=2
    (3L, "dog dog dog bird"),  // tf(cat)=0
    (4L, "fish bird")          // tf(cat)=0
  ).toDF("doc_id", "text")

  test("bm25TopK: ranks by score, excludes non-matching docs, exact integers") {
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("cat"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // doc 3,4 excluded
    // reference BM25 (k1=1.2, b=0.75, N=4, df=2, avgdl=11/4):
    // idf = ln((4-2+0.5)/(2+0.5)+1) = ln(2)
    val idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / (11.0 / 4.0)))
    assert(got(0) == ((1L, 1L, 2L, math.floor(s(2, 3) * 10000).toLong)))
    assert(got(1) == ((2L, 1L, 1L, math.floor(s(1, 2) * 10000).toLong)))
  }

  test("bm25TopK: multi-term scores sum in fixed order; rarer term scores higher") {
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("dog", "fish"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(4L) == 1L) // fish only
    assert(got(2L) == 1L)
  }

  test("termVector: per-term tf columns, zero for absent") {
    val got = Search.termVector(docs, "doc_id", "text", Seq("cat", "bird"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2L, 0L)))
    assert(got(3L) == ((0L, 1L)))
  }

  test("hybridTopK: RRF fuses keyword and vector pools with exact micro-units") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 4 docs; terms hit docs 1,2; vectors put doc 3 nearest to query 0
    val d = Seq((0L, "cat dog"), (1L, "cat cat cat"), (2L, "cat"), (3L, "fish"))
      .toDF("doc_id", "text")
    val e = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.5f, 0.5f)), (3L, Array(1.0f, 0.1f))).toDF("vec_id", "embedding")
    val got = Search.hybridTopK(d, e, "doc_id", "text", "vec_id", "embedding",
      Seq("cat"), queryVecId = 0L, k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def rrf(r: Int): Long = math.round(1e6 / (60 + r))
    // keyword ranks: doc1 (3x cat) > doc0? bm25 tf saturation ranks by tf
    // then doc_id; vector ranks EXCLUDE the query itself: 3, 2, 1
    val kw = Map(1L -> 1, 2L -> 2, 0L -> 3) // doc3 has no term match
    val vec = Map(3L -> 1, 2L -> 2, 1L -> 3)
    val want = (0L to 3L).map(id =>
      id -> (kw.get(id.toInt).map(rrf).getOrElse(0L) + vec.get(id).map(rrf).getOrElse(0L))).toMap
    assert(got == want)
  }

  test("persisted index probe equals the scan path bit-for-bit") {
    val corpus = SparkEntry.T(spark, sf0001, "documents")
    val terms = Seq("spark", "dup", "vector")
    val path = s"${sys.props("java.io.tmpdir")}/graft-search-spec/idx"
    Search.writeIndex(corpus, "doc_id", "text", path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val scan = rows(Search.bm25TopK(corpus, "doc_id", "text", terms, 25))
    val idx = rows(Search.probeBm25(spark, path, "doc_id", terms, 25))
    assert(idx == scan, "index probe must reproduce the scan ranking exactly")
    assert(scan.nonEmpty)
  }

  test("persisted index probe pushes tok IN (…) into the postings scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = s"${sys.props("java.io.tmpdir")}/graft-search-spec/idx2"
    Search.writeIndex(docs, "doc_id", "text", path)
    val probed = Search.probeBm25(spark, path, "doc_id", Seq("cat", "fish"), 10)
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case f: FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          fileScans(a.executedPlan)
      }.flatten
    val scans = fileScans(probed.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("idx2/postings")))
    assert(scans.nonEmpty, "expected a file scan over the persisted postings")
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "").contains("In(tok")),
      "the probe's tok IN (…) predicate must reach the parquet scan")
    // the doclens sidecar gets the matched doc ids pushed the same way —
    // the length-prior read is O(matched docs), not O(corpus)
    val dlScans = fileScans(probed.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("idx2/doclens")))
    assert(dlScans.nonEmpty, "expected a file scan over the doclens sidecar")
    assert(dlScans.exists(_.metadata.getOrElse("PushedFilters", "").contains("In(doc_id")),
      "the matched-id IN (…) predicate must reach the doclens scan")
  }

  test("probe against a corpus whose docs all tokenize empty keeps the id type") {
    val sqlImplicits = spark.implicits
    import sqlImplicits._
    val path = s"${sys.props("java.io.tmpdir")}/graft-search-spec/idx-empty"
    // non-Long id type + zero tokens everywhere → postings is schema-less
    val empty = Seq(("a", "   "), ("b", "\t")).toDF("doc_id", "text")
    Search.writeIndex(empty, "doc_id", "text", path)
    val got = Search.probeBm25(spark, path, "doc_id", Seq("cat"), 10)
    assert(got.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType,
      "degenerate path must inherit the stored id type, not hardcode Long")
    assert(got.count() == 0)
  }

  test("probe handles terms absent from the index (df = 0 contributes nothing)") {
    val path = s"${sys.props("java.io.tmpdir")}/graft-search-spec/idx3"
    Search.writeIndex(docs, "doc_id", "text", path)
    val got = Search.probeBm25(spark, path, "doc_id", Seq("cat", "unicorn"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // only cat matches; unicorn has no postings and must not crash or score
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got.forall(_._2 == 1L))
  }
}
