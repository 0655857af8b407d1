package graft

import graft.ext.CorpusClean
import org.apache.spark.sql.functions._

/** Corpus curation: C4-style span dedup, repetition signals, PII
  * redaction, benchmark decontamination — hand-built corpora with known
  * answers.
  */
class CorpusCleanSpec extends SparkSpec {
  import spark.implicits._

  test("segments: fixed-width chunks, ragged tail, empty text → empty array") {
    val df = Seq("a b c d e f g", "x", "").toDF("text")
    val got = df.select(CorpusClean.segments(col("text"), 3)).collect()
      .map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "d e f", "g"))
    assert(got(1) == Seq("x"))
    assert(got(2) == Seq.empty)
  }

  test("c4Dedup: duplicated span keeps only first occurrence; doc reassembled in order") {
    val df = Seq(
      (1L, "one two three four five six"),   // spans: "one two three", "four five six"
      (2L, "one two three seven eight nine"), // first span duplicates doc 1's
      (3L, "four five six")                   // whole doc duplicates doc 1's 2nd span
    ).toDF("doc_id", "text")
    val got = CorpusClean.c4Dedup(df, "doc_id", "text", 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 2L, "one two three four five six")))
    assert(got(2L) == ((2L, 1L, "seven eight nine")))
    assert(got(3L) == ((1L, 0L, "")))
  }

  test("repetitionStats: duplicate spans and top bigram mass are exact") {
    val df = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    // spans(2): "a b","a b","a b" → n_seg=3, distinct=1
    // bigrams: "a b","b a","a b","b a","a b" → n=5, top "a b"×3
    val r = CorpusClean.repetitionStats(df, "doc_id", "text", 2).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((3L, 1L, 5L, 3L)))
  }

  test("redactPii: email before phone before ip; counts match") {
    val t = lit("mail bob.smith+x@corp.example.org call +123-456-7890 host 192.168.0.1 end")
    val got = spark.range(1).select(CorpusClean.redactPii(t)).collect()(0).getString(0)
    assert(got == "mail <EMAIL> call <PHONE> host <IP> end")
    val (ne, np, ni) = CorpusClean.piiCounts(t)
    val c = spark.range(1).select(ne, np, ni).collect()(0)
    assert((c.getLong(0), c.getLong(1), c.getLong(2)) == ((1L, 1L, 1L)))
  }

  test("stripMarkup: tags, entities, script/style blocks (incl. multiline) all go") {
    val html = "<html><head><style>\np { color: red; }\n</style></head>" +
      "<body><h1>Title</h1>\n<p class=\"x\">Hello   <b>bold</b> world &amp; " +
      "&lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b</p>" +
      "<script type=\"text/javascript\">\nvar x = 1 && 2;\n</script></body></html>"
    val got = spark.range(1)
      .select(CorpusClean.stripMarkup(org.apache.spark.sql.functions.lit(html)))
      .collect()(0).getString(0)
    assert(got == "Title Hello bold world & <tag> \"q\" 's' a b")
  }

  test("stripMarkup: plain text is untouched except whitespace collapse") {
    val got = spark.range(1)
      .select(CorpusClean.stripMarkup(org.apache.spark.sql.functions.lit("  just\t\ttext\nhere ")))
      .collect()(0).getString(0)
    assert(got == "just text here")
  }

  test("decontaminate: only docs sharing an n-gram with bench are flagged") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "beta gamma delta epsilon"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val bench = Seq((9L, "beta gamma delta")).toDF("doc_id", "text")
    val got = CorpusClean.decontaminate(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L) == ((1L, true)))
    assert(got(2L) == ((1L, true)))
    assert(got(3L) == ((0L, false)))
  }
}
