package graft.sources

import graft.plans.{FileDef, SchemaType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input loading. Reference: load_data (main.py:361-394) — declared schema
  * becomes dtype overrides; columns NOT in the declared schema are inferred
  * (infer window 1000 rows); missing/extra columns produce warnings only.
  * The reference only implements CSV (main.py:369-370 raises for json/
  * parquet despite the config allowing them) — we support all three, since
  * parquet is the 100 TB path.
  */
object Source {

  def load(spark: SparkSession, fd: FileDef): DataFrame = fd.format match {
    case "csv"     => loadCsv(spark, fd.path, fd.schema.columns.map { case (n, d) => n -> d.tpe })
    case "json"    => castDeclared(spark.read.json(fd.path), fd)
    case "parquet" => castDeclared(spark.read.parquet(fd.path), fd)
    case other     => throw new IllegalArgumentException(s"unsupported input format '$other'")
  }

  /** CSV with declared dtype overrides + inference for undeclared columns.
    * Two cheap passes: header-only read to discover the column set, then a
    * full read with an explicit schema (declared types for declared columns,
    * inferred types for the rest). Keeping the final read schema explicit
    * means the scan is single-pass over the data at scale.
    */
  def loadCsv(spark: SparkSession, path: String,
              declared: Seq[(String, SchemaType)]): DataFrame = {
    val declaredMap = declared.toMap
    val header = spark.read.option("header", true).csv(path).schema.fieldNames
    val missing = declared.map(_._1).filterNot(header.contains)
    if (missing.nonEmpty)
      System.err.println(s"[source] warning: declared columns absent from $path: ${missing.mkString(", ")}")

    val undeclared = header.filterNot(declaredMap.contains)
    val inferredTypes: Map[String, DataType] =
      if (undeclared.isEmpty) Map.empty
      else {
        // reference parity: inference window of 1000 rows (main.py:381).
        // Inference runs on ONLY the first 1000 data lines — a full-file
        // `inferSchema` pass would both scan everything (cost at scale) and
        // infer from rows outside the reference's window (parity drift).
        val sampleLines = headLines(spark, path, 1001) // header + 1000 rows
        val sampleDs = spark.createDataset(sampleLines)(
          org.apache.spark.sql.Encoders.STRING)
        spark.read.option("header", true).option("inferSchema", true)
          .csv(sampleDs).schema.fields.map(f => f.name -> f.dataType).toMap
      }

    val schema = StructType(header.map { name =>
      val dt = declaredMap.get(name).map(_.spark)
        .orElse(inferredTypes.get(name)).getOrElse(StringType)
      StructField(name, dt, nullable = true)
    })
    spark.read.option("header", true).schema(schema)
      .option("dateFormat", "yyyy-MM-dd").csv(path)
  }

  /** First `n` lines of a CSV source. Local regular files read directly
    * (exact head, zero Spark jobs); directories/globs/remote paths fall
    * back to a bounded text scan — the limit stops the scan after enough
    * partitions produce rows, so the cost stays O(n), not O(file).
    */
  private def headLines(spark: SparkSession, path: String, n: Int): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isFile) {
      val src = scala.io.Source.fromFile(f)
      try src.getLines().take(n).toList finally src.close()
    } else {
      spark.read.textFile(path).limit(n).collect().toSeq
    }
  }

  /** For self-describing formats: cast declared columns to their declared
    * types; leave undeclared columns as read.
    */
  private def castDeclared(df: DataFrame, fd: FileDef): DataFrame = {
    val present = df.columns.toSet
    fd.schema.columns.foldLeft(df) { case (acc, (name, cd)) =>
      if (present(name) && acc.schema(name).dataType != cd.tpe.spark)
        acc.withColumn(name, col(name).cast(cd.tpe.spark))
      else acc
    }
  }
}
