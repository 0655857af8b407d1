package graft

import graft.plans._

/** The three primitives the external LLM flow-generation loop consumes
  * (SURVEY §3.2): tryApply (trial-run feedback), schemaDiff, sampleJson.
  */
class AgentApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq((1L, "a", "2024-01-15"), (2L, "b", "not-a-date"))
    .toDF("id", "name", "d")

  test("tryApply commits good operations and returns feedback for bad ones") {
    val ok = AgentApi.tryApply(spark, df, Equality("name", Some("n2")), Map.empty)
    assert(ok.isRight)
    assert(ok.toOption.get.columns.contains("n2"))

    // unknown input column → analysis error surfaced as feedback text
    val bad = AgentApi.tryApply(spark, df, Equality("nope", Some("x")), Map.empty)
    assert(bad.isLeft)
    assert(bad.left.toOption.get.contains("nope"))

    // runtime failure (strict cast on bad data) also becomes feedback —
    // the trial-run loop (reference main.py:255) depends on this
    val badCast = AgentApi.tryApply(spark, df, Casting("d", SchemaType.Dt, Some("dd")), Map.empty)
    assert(badCast.isLeft)
  }

  test("schemaDiff produces actionable feedback and passes on conformance") {
    val target = FileSchema("t", Seq(
      "id" -> ColumnDef(SchemaType.Int64),
      "name" -> ColumnDef(SchemaType.Str),
      "missing_col" -> ColumnDef(SchemaType.Flt)))
    val diff = AgentApi.schemaDiff(df, target)
    assert(diff.isDefined && diff.get.contains("missing_col"))
    val target2 = FileSchema("t", Seq("id" -> ColumnDef(SchemaType.Int64)))
    assert(AgentApi.schemaDiff(df, target2).isEmpty)
  }

  test("sampleJson returns a bounded JSON array of rows") {
    val json = AgentApi.sampleJson(df, 2)
    assert(json.startsWith("[") && json.endsWith("]"))
    assert(json.contains("\"id\":1") && json.contains("\"name\":\"a\""))
    assert(!json.contains("not-a-date") || json.count(_ == '{') <= 2)
  }
}
