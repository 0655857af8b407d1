package graft

import org.apache.spark.sql.functions._

/** Regression tests for the round-7 advice items: degenerate inputs must
  * degrade the way the oracle would (fewer rows), never crash the
  * driver, and type holes must fail at analysis time, never read
  * garbage.
  */
class EdgeCaseSpec extends SparkSpec {

  test("srch_mmr with an empty BM25 pool returns 0 rows, not a crash") {
    // a corpus where no document contains any query term -> empty pool
    val dir = s"${sys.props("java.io.tmpdir")}/graft-edge/no-hits"
    import spark.implicits._
    Seq((1L, "alpha beta gamma", "en", "web", 16L),
        (2L, "delta epsilon zeta", "en", "web", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("srch_mmr")(spark, dir)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("rank", "doc_id", "score_bp",
      "rel_norm_micro", "maxsim_micro", "mmr_score"))
  }

  test("srch_mmr with a pool smaller than k emits that many rows") {
    // exactly one document matches a query term -> pool of 1, top-1 out
    val dir = s"${sys.props("java.io.tmpdir")}/graft-edge/one-hit"
    import spark.implicits._
    Seq((1L, "spark in the corpus", "en", "web", 19L),
        (2L, "unrelated words only", "en", "web", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("srch_mmr")(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 1L)
  }

  test("vector kernels reject non-float/double element types at analysis") {
    import spark.implicits._
    val ints = Seq((1L, Array(1, 2, 3))).toDF("id", "v")
    val e = intercept[Exception] {
      ints.select(graft.functions.VectorExprs.dot(col("v"), col("v"))).collect()
    }
    assert(e.getMessage.contains("float or double"),
      s"expected the element-type analysis error, got: ${e.getMessage}")
    val e2 = intercept[Exception] {
      ints.select(graft.functions.VectorExprs.norm(col("v"))).collect()
    }
    assert(e2.getMessage.contains("float or double"))
    // the valid types still pass
    val d = Seq((1L, Array(3.0, 4.0))).toDF("id", "v")
      .select(graft.functions.VectorExprs.norm(col("v"))).head().getDouble(0)
    assert(math.abs(d - 5.0) < 1e-12)
  }
}
