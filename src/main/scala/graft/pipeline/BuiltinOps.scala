package graft.pipeline

import graft.config.ConfigTree.Tree
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Builtin relational ops for pipeline nodes: instead of a registered
  * Scala function, a node may declare `"op": {"kind": ...}` built
  * from Spark SQL expression strings. This is the declarative half of
  * the §2.10 surface — the whole relational inventory reachable from
  * JSON, compiled to exactly the same Catalyst plans as the native
  * DataFrame API (expressions parse to the same trees `selectExpr`
  * produces; nothing is interpreted at run time).
  */
object BuiltinOps {

  import DagCompiler.PipelineError

  private def str(spec: Tree, key: String): String =
    spec.getOrElse(key, throw PipelineError(s"op missing '$key': $spec")).toString

  private def strSeq(spec: Tree, key: String): Seq[String] =
    spec.get(key) match {
      case Some(xs: Seq[_]) => xs.map(_.toString)
      case Some(s: String)  => Seq(s)
      case None => throw PipelineError(s"op missing '$key': $spec")
      case Some(other) => throw PipelineError(s"op '$key': bad form $other")
    }

  private def df(args: Map[String, Any], name: String): DataFrame =
    args.get(name) match {
      case Some(d: DataFrame) => d
      case other => throw PipelineError(s"op input '$name': expected DataFrame, got $other")
    }

  def compile(spec: Tree, spark: SparkSession): Transform = Transform { args =>
    str(spec, "kind") match {
      case "table" =>
        df(args, str(spec, "table"))
      case "select" =>
        df(args, "df").selectExpr(strSeq(spec, "exprs"): _*)
      case "filter" =>
        df(args, "df").filter(str(spec, "condition"))
      case "agg" =>
        val aggs = strSeq(spec, "aggs").map(expr)
        val d = df(args, "df")
        val grouped = spec.get("groupBy") match {
          case Some(_) => d.groupBy(strSeq(spec, "groupBy").map(expr): _*)
          case None => d.groupBy()
        }
        grouped.agg(aggs.head, aggs.tail: _*)
      case "join" =>
        df(args, "left").alias("l")
          .join(df(args, "right").alias("r"),
            expr(str(spec, "condition")),
            spec.get("how").map(_.toString).getOrElse("inner"))
      case "orderBy" =>
        // a trailing " asc"/" desc" is a sort direction, not part of
        // the expression (expr() would read it as a column alias)
        val sortCols = strSeq(spec, "exprs").map { e =>
          val t = e.trim
          val lower = t.toLowerCase
          if (lower.endsWith(" desc")) expr(t.dropRight(5)).desc
          else if (lower.endsWith(" asc")) expr(t.dropRight(4)).asc
          else expr(t)
        }
        df(args, "df").orderBy(sortCols: _*)
      case "limit" =>
        df(args, "df").limit(str(spec, "n").toInt)
      case "union" =>
        df(args, "left").union(df(args, "right"))
      case "distinct" =>
        df(args, "df").distinct()
      case other => throw PipelineError(s"unknown builtin op kind '$other'")
    }
  }
}
