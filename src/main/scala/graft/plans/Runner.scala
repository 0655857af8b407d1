package graft.plans

import graft.operators.Ops
import graft.sources.{Sink, Source}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Pipeline execution. Reference control flow: apply_operations
  * (main.py:397-429) + the per-output loop (main.py:531-613). The crucial
  * architectural difference: the reference materializes a full DataFrame per
  * operation; here the whole flow folds into ONE lazy plan, and only the
  * sink's write triggers execution — Catalyst sees scan→ops→project as a
  * single tree (projection pruning reaches the scan, the withColumn chain
  * collapses to one Project, join order/strategy is optimizer-chosen).
  */
object Runner {

  /** Fold all operations over the frame, then drop assignation-created temp
    * columns named `_*_` (leading+trailing underscore) — reference parity
    * (main.py:408-416, 423-427).
    */
  def applyAll(spark: SparkSession, df: DataFrame, ops: Seq[Operation],
               inputs: Map[String, FileDef]): DataFrame = {
    val result = ops.zipWithIndex.foldLeft(df) { case (acc, (op, i)) =>
      try Ops.applyOp(spark, acc, op, inputs)
      catch {
        case e: Exception =>
          throw new RuntimeException(
            s"operation ${i + 1} (${op.opType}) failed: ${e.getMessage}", e)
      }
    }
    val tempCols = ops.collect {
      case a: Assignation if a.outputColumn.exists(c =>
        c.length > 1 && c.startsWith("_") && c.endsWith("_")) => a.outputColumn.get
    }.distinct.filter(result.columns.contains)
    if (tempCols.nonEmpty) result.drop(tempCols: _*) else result
  }

  /** Run one output pipeline end-to-end: load source → ops → validate →
    * sink. Returns the validation feedback on failure (nothing written).
    */
  def runOutput(spark: SparkSession, config: PipelineConfig, outputKey: String,
                flow: PipelineFlow, prettyJson: Boolean = true): Option[String] = {
    val outDef = config.outputMap.getOrElse(outputKey,
      throw new IllegalArgumentException(s"unknown output '$outputKey'"))
    val srcDef = config.inputMap.getOrElse(flow.source,
      throw new IllegalArgumentException(s"flow source '${flow.source}' not in config inputs"))
    val df = Source.load(spark, srcDef)
    val result = applyAll(spark, df, flow.operations, config.inputMap)
    SchemaValidator.diff(result.schema, outDef.schema) match {
      case some @ Some(_) => some
      case None => Sink.save(result, outDef, prettyJson); None
    }
  }
}

/** Output schema validation. Reference: validate_schema (main.py:287-334) —
  * missing columns + per-column type equality; extra columns tolerated;
  * `positive integer` accepts any Int64/LongType (main.py:318-320); error
  * text uses the lossy reverse type map (SchemaType.reverseName).
  */
object SchemaValidator {

  def diff(actual: StructType, target: FileSchema): Option[String] = {
    val actualMap = actual.fields.map(f => f.name -> f.dataType).toMap
    val missing = target.columnNames.filterNot(actualMap.contains)
    val mismatches = target.columns.flatMap { case (name, cd) =>
      actualMap.get(name) match {
        case Some(dt) if typeOk(dt, cd.tpe) => None
        case Some(dt) => Some(
          s"column '$name': expected ${cd.tpe.name}, got ${SchemaType.reverseName(dt)}")
        case None => None
      }
    }
    if (missing.isEmpty && mismatches.isEmpty) None
    else Some(
      (missing.map(c => s"missing column '$c'") ++ mismatches).mkString("; "))
  }

  private def typeOk(actual: DataType, declared: SchemaType): Boolean =
    actual == declared.spark ||
      // main.py:318-320 — `positive integer` accepts plain Int64 and
      // vice-versa (both are LongType; the distinction is documentary)
      (declared.spark == LongType && actual == LongType)
}

/** The three primitives the EXTERNAL LLM generation loop consumes
  * (SURVEY §3.2 — orchestration itself is out of engine scope by mandate).
  * All are cheap on a lazy DataFrame: tryApply analyzes the plan and touches
  * at most `sampleRows` rows.
  */
object AgentApi {

  /** Trial-apply one op: analysis + a tiny action to surface runtime errors
    * (the reference's trial execution, main.py:255). Left = failure text to
    * feed back to the generator.
    */
  def tryApply(spark: SparkSession, df: DataFrame, op: Operation,
               inputs: Map[String, FileDef], sampleRows: Int = 3): Either[String, DataFrame] =
    try {
      val next = Ops.applyOp(spark, df, op, inputs)
      next.limit(sampleRows).collect() // force analysis + a bounded execution
      Right(next)
    } catch { case e: Exception => Left(e.getMessage) }

  /** Schema feedback string, or None when the frame satisfies the target. */
  def schemaDiff(df: DataFrame, target: FileSchema): Option[String] =
    SchemaValidator.diff(df.schema, target)

  /** JSON sample of the first n rows (the reference sends head(3) to the
    * LLM, main.py:136-137).
    */
  def sampleJson(df: DataFrame, n: Int = 3): String =
    df.limit(n).toJSON.collect().mkString("[", ",", "]")
}
