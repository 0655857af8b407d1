package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftbridge.Bridge

/** GraftExtensions injects every native function; after applying its
  * injections to the session registry, the functions resolve in pure SQL.
  */
class ExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions entry point registers all graft functions for SQL") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    Bridge.registerFunctions(ext, spark.sessionState.functionRegistry)

    assert(spark.sql("SELECT graft_hamming64(1L, 3L)").collect().head.getLong(0) == 1L)
    assert(spark.sql("SELECT graft_simhash64('a b c') = graft_simhash64('c b a')")
      .collect().head.getBoolean(0)) // bag-of-words: permutation-invariant
    assert(spark.sql("SELECT size(graft_text_minhash('w1 w2 w3 w4', 3, 16))")
      .collect().head.getInt(0) == 16)
    assert(spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .collect().head.getDouble(0) == 11.0)
    assert(spark.sql("SELECT graft_norm(array(3.0D, 4.0D))").collect().head.getDouble(0) == 5.0)
    assert(spark.sql("SELECT size(graft_hplanes(array(1.0D, 2.0D), 4, 8))")
      .collect().head.getInt(0) == 8)
    assert(spark.sql("SELECT size(graft_winnow('the quick brown fox jumps over it', 8, 16)) >= 1")
      .collect().head.getBoolean(0))
    // DESCRIBE surface exists (ExpressionInfo wired)
    val desc = spark.sql("DESCRIBE FUNCTION graft_simhash64").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("graft_simhash64"))
  }
}
