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

  /** Write `df` per `fd`. JSON defaults to DISTRIBUTED NDJSON — the safe
    * library default at any scale; the collected pretty-printed array
    * (reference byte-parity) is opt-in via `prettyJson = true` and is
    * passed only by the CLI-parity pipeline path (Runner.runOutput),
    * where outputs are reference-scale by construction. A library caller
    * never driver-collects by default.
    */
  def save(df: DataFrame, fd: FileDef, prettyJson: Boolean = false): Unit = {
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
      case "orc" if fd.path.toLowerCase.endsWith(".orc") =>
        writeSingleFile(out, fd.path, "orc", Map.empty)
      case "orc" =>
        out.write.mode(SaveMode.Overwrite).orc(fd.path)
      case "json" if !prettyJson =>
        // distributed NDJSON — the at-scale JSON representation
        val rendered = renderDates(out)
        rendered.write.mode(SaveMode.Overwrite).json(fd.path)
      case "json" =>
        // reference parity (main.py:464-470): `json.dump(rows, indent=2)` —
        // an indent-2 array of row objects, dates %Y-%m-%d, nulls INCLUDED
        // (Spark's toJSON drops null fields, so rows are rendered from
        // collected Rows instead). Collect is deliberate and documented:
        // this branch is for reference-scale outputs only.
        val rendered = renderDates(out)
        val names = rendered.schema.fieldNames.toSeq
        val rows = rendered.collect()
        val body =
          if (rows.isEmpty) "[]"
          else rows.map(r => "  " + pyJsonObject(names.zip(r.toSeq), 2))
            .mkString("[\n", ",\n", "\n]")
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

  // ---- CPython-json.dump-parity rendering (indent=2, ensure_ascii=True) ----

  /** JSON string literal exactly as CPython's json module writes it:
    * ensure_ascii escaping (non-ASCII → lowercase \\uXXXX) plus the short
    * escapes for quote/backslash/control chars.
    */
  private[sources] def pyJsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Doubles as CPython repr renders them: plain decimal for decimal
    * exponent in [-4, 15], else `1.5e+16` / `1e-05` scientific (Java flips
    * to E-notation already at 1e7, so the Java form is re-expanded).
    */
  private[sources] def pyJsonDouble(d: Double): String = {
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else {
      val s = java.lang.Double.toString(d) // shortest round-trip, like repr
      val eIdx = s.indexOf('E')
      if (eIdx < 0) s
      else {
        val mantissa = s.substring(0, eIdx)
        val exp = s.substring(eIdx + 1).toInt
        if (exp >= -4 && exp < 16) {
          val plain = new java.math.BigDecimal(s).toPlainString
          if (plain.contains('.')) plain else plain + ".0"
        } else {
          val m = if (mantissa.endsWith(".0")) mantissa.dropRight(2) else mantissa
          val sign = if (exp < 0) "-" else "+"
          val mag = math.abs(exp)
          val eStr = if (mag < 10) "0" + mag else mag.toString
          s"${m}e$sign$eStr"
        }
      }
    }
  }

  private[sources] def pyJsonValue(v: Any, indent: Int): String = v match {
    case null                       => "null"
    case b: Boolean                 => if (b) "true" else "false"
    case s: String                  => pyJsonString(s)
    case d: java.sql.Date           => pyJsonString(d.toString)
    case d: java.time.LocalDate     => pyJsonString(d.toString)
    case t: java.sql.Timestamp      => pyJsonString(t.toString)
    case f: Float                   => pyJsonDouble(f.toDouble)
    case d: Double                  => pyJsonDouble(d)
    case bd: java.math.BigDecimal   => bd.toPlainString
    case bd: BigDecimal             => bd.underlying.toPlainString
    case r: org.apache.spark.sql.Row =>
      pyJsonObject(r.schema.fieldNames.toSeq.zip(r.toSeq), indent)
    case m: scala.collection.Map[_, _] =>
      pyJsonObject(m.toSeq.map { case (k, vv) => (String.valueOf(k), vv) }, indent)
    case seq: scala.collection.Seq[_] =>
      if (seq.isEmpty) "[]"
      else {
        val pad = " " * (indent + 2)
        seq.map(e => pad + pyJsonValue(e, indent + 2))
          .mkString("[\n", ",\n", "\n" + " " * indent + "]")
      }
    case n: Number => n.toString
    case other     => pyJsonString(other.toString)
  }

  private[sources] def pyJsonObject(fields: Seq[(String, Any)], indent: Int): String =
    if (fields.isEmpty) "{}"
    else {
      val pad = " " * (indent + 2)
      fields.map { case (k, v) => pad + pyJsonString(k) + ": " + pyJsonValue(v, indent + 2) }
        .mkString("{\n", ",\n", "\n" + " " * indent + "}")
    }
}
