package graft.plans

import org.yaml.snakeyaml.{LoaderOptions, Yaml => SnakeYaml}
import org.yaml.snakeyaml.constructor.SafeConstructor
import scala.jdk.CollectionConverters._

/** YAML → model codec. Mirrors the reference's Pydantic parsing:
  * PipelineConfig (models.py:141-144, main.py:337-358) and PipelineFlow with
  * discriminated-union op decode on `operation_type` (models.py:122-137,
  * main.py:483-499). snakeyaml ships in /opt/spark/jars.
  */
object Yaml {

  private def loader = new SnakeYaml(new SafeConstructor(new LoaderOptions()))

  /** snakeyaml gives java.util collections; normalize to Scala. Insertion
    * order is preserved (snakeyaml uses LinkedHashMap) — column order matters.
    */
  private def norm(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.toSeq.map { case (k, v2) => (k.toString, norm(v2)) }
    case l: java.util.List[_] => l.asScala.toSeq.map(norm)
    case other => other
  }

  type Obj = Seq[(String, Any)]

  private def asObj(v: Any, ctx: String): Obj = v match {
    case s: Seq[_] => s.asInstanceOf[Obj]
    case other => fail(s"$ctx: expected mapping, got $other")
  }
  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private implicit class ObjOps(o: Obj) {
    def get(k: String): Option[Any] =
      o.collectFirst { case (`k`, v) if v != null => v }
    def req(k: String, ctx: String): Any =
      get(k).getOrElse(fail(s"$ctx: missing required field '$k'"))
    def str(k: String, ctx: String): String = req(k, ctx).toString
    def strOpt(k: String): Option[String] = get(k).map(_.toString)
    def strList(k: String, ctx: String): Seq[String] = req(k, ctx) match {
      case s: Seq[_] => s.map(_.toString)
      case other     => fail(s"$ctx.$k: expected list, got $other")
    }
    def objOpt(k: String): Option[Obj] = get(k).map(asObj(_, k))
  }

  def parse(text: String): Any = norm(loader.load[Object](text))

  // -------------------------------------------------------------- config

  def parseConfig(text: String): PipelineConfig = {
    val root = asObj(parse(text), "config")
    def files(key: String): Seq[(String, FileDef)] =
      root.objOpt(key).getOrElse(Nil).map { case (name, v) =>
        name -> parseFileDef(asObj(v, s"$key.$name"), s"$key.$name")
      }
    val cfg = PipelineConfig(files("inputs"), files("outputs"))
    // main.py:348-351 — at least one of each.
    if (cfg.inputs.isEmpty) fail("config: at least one input is required")
    if (cfg.outputs.isEmpty) fail("config: at least one output is required")
    cfg
  }

  private def parseFileDef(o: Obj, ctx: String): FileDef = {
    val fmt = o.strOpt("format").getOrElse("csv").toLowerCase
    if (!Set("csv", "json", "parquet", "orc")(fmt)) fail(s"$ctx: unsupported format '$fmt'")
    FileDef(o.str("path", ctx), fmt, parseFileSchema(asObj(o.req("file_schema", ctx), ctx), ctx))
  }

  private def parseFileSchema(o: Obj, ctx: String): FileSchema = {
    val cols = asObj(o.req("columns", ctx), s"$ctx.columns").map { case (name, v) =>
      v match {
        case colObj: Seq[_] =>
          val co = colObj.asInstanceOf[Obj]
          name -> ColumnDef(SchemaType.fromName(co.str("type", s"$ctx.$name")), co.strOpt("description"))
        case s => name -> ColumnDef(SchemaType.fromName(s.toString)) // shorthand `col: integer`
      }
    }
    FileSchema(o.strOpt("name").getOrElse("schema"), cols)
  }

  // -------------------------------------------------------------- flow

  def parseFlow(text: String): PipelineFlow = {
    val root = asObj(parse(text), "flow")
    val ops = root.req("operations", "flow") match {
      case s: Seq[_] => s.zipWithIndex.map { case (v, i) =>
        parseOperation(asObj(v, s"operations[$i]"), s"operations[$i]")
      }
      case other => fail(s"flow.operations: expected list, got $other")
    }
    PipelineFlow(root.str("source", "flow"), ops)
  }

  def parseOperation(o: Obj, ctx: String): Operation = {
    val out = o.strOpt("output_column")
    o.str("operation_type", ctx) match {
      case "equality" => Equality(o.str("input_column", ctx), out)
      case "concatenation" =>
        Concatenation(o.strList("input_columns", ctx), o.strOpt("separator").getOrElse(""), out)
      case "application" =>
        Application(o.strList("input_columns", ctx), o.str("function_str", ctx), out)
      case "switching" =>
        val mapping = o.objOpt("mapping").getOrElse(Nil).map { case (k, v) => (k: Any, v.toString) }
        Switching(o.str("switch_column", ctx), mapping, o.strOpt("default_column"),
          o.get("default_value"), out)
      case "assignation" => Assignation(o.req("value", ctx), out)
      case "casting" =>
        Casting(o.str("input_column", ctx), SchemaType.fromName(o.str("target_type", ctx)), out)
      case "arithmetic" =>
        Arithmetic(o.strList("input_columns", ctx), o.str("operator", ctx), out)
      case "comparison" =>
        Comparison(o.str("input_column", ctx), o.str("operator", ctx), o.req("value", ctx), out)
      case "bind" =>
        Bind(
          o.str("right_file_path", ctx),
          o.objOpt("right_schema_columns").getOrElse(Nil)
            .map { case (k, v) => k -> SchemaType.fromName(v.toString) },
          o.str("left_on", ctx), o.str("right_on", ctx),
          o.strOpt("how").getOrElse("left"),
          o.strList("columns_to_add", ctx))
      case "fold" =>
        Fold(o.strList("id_columns", ctx), o.strList("value_columns", ctx),
          o.str("key_column_name", ctx), o.str("value_column_name", ctx))
      case "unfold" =>
        Unfold(o.strList("index_columns", ctx), o.str("key_column", ctx), o.str("value_column", ctx))
      // ---- extended (beyond-reference) operations ----
      case "filter" => FilterOp(o.str("predicate", ctx))
      case "aggregate" =>
        val aggs = o.objOpt("aggregations").getOrElse(Nil).map { case (outCol, v) =>
          v match {
            case spec: Seq[_] =>
              val so = spec.asInstanceOf[Obj]
              outCol -> (so.str("func", ctx), so.strOpt("column").getOrElse("*"))
            case s => // shorthand "sum:col"
              val parts = s.toString.split(":", 2)
              outCol -> (parts(0), if (parts.length > 1) parts(1) else "*")
          }
        }
        AggregateOp(o.strList("group_by", ctx), aggs,
          o.strOpt("mode").getOrElse("group"))
      case "sort" =>
        val keys = o.req("sort_by", ctx) match {
          case s: Seq[_] => s.map {
            case (k: String, dir) => (k, dir.toString.toLowerCase != "desc")
            case k => (k.toString, true)
          }
          case other => fail(s"$ctx.sort_by: expected list, got $other")
        }
        SortOp(keys, o.get("limit").map(_.toString.toInt))
      case "window" =>
        val order = o.get("order_by").map {
          case s: Seq[_] => s.map {
            case (k: String, dir) => (k, dir.toString.toLowerCase != "desc")
            case k => (k.toString, true)
          }
          case other => Seq((other.toString, true))
        }.getOrElse(Nil)
        WindowOp(o.get("partition_by").map {
          case s: Seq[_] => s.map(_.toString); case other => Seq(other.toString)
        }.getOrElse(Nil), order, o.str("func", ctx), o.strOpt("column"), out)
      case "distinct" =>
        DistinctOp(o.get("subset").map {
          case s: Seq[_] => s.map(_.toString); case other => Seq(other.toString)
        }.getOrElse(Nil))
      case "set" => SetOp(o.str("kind", ctx), o.str("right_input", ctx))
      case "select" =>
        val cols = o.req("columns", ctx) match {
          case s: Seq[_] => s.map {
            case (k: String, v) => (k, Option(v).map(_.toString))
            case k => (k.toString, None: Option[String])
          }
          case other => fail(s"$ctx.columns: expected list, got $other")
        }
        SelectOp(cols)
      case other =>
        // main.py:417-418 skips unknown op types with a warning; we surface
        // a typed error at parse so callers can choose (Runner warns+skips).
        UnknownOp(other)
    }
  }
}
