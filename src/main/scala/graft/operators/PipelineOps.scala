package graft.operators

import graft.Tables
import graft.pipeline.{DagCompiler, PipelineSpec, TransformRegistry}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The DAG compiler driven end-to-end as a driver-gate query: a
  * transformations.json-shaped spec whose nodes are builtin ops,
  * compiled and executed to reproduce q01 — and checked against the
  * SAME DuckDB oracle as q01, so the pipeline layer itself is inside
  * the correctness gate.
  */
object PipelineOps {
  type Q = (SparkSession, String) => DataFrame

  private val specJson =
    """{
      |  "Main": {
      |    "load_lineitem": {
      |      "needed-data": ["lineitem"],
      |      "op": {"kind": "table", "table": "lineitem"}
      |    },
      |    "recent": {
      |      "dependencies": {"load_lineitem": "df"},
      |      "op": {"kind": "filter",
      |             "condition": "l_shipdate <= timestamp'1999-12-01 00:00:00'"}
      |    },
      |    "summary": {
      |      "dependencies": {"recent": "df"},
      |      "op": {"kind": "agg",
      |             "groupBy": ["l_returnflag", "l_linestatus"],
      |             "aggs": [
      |               "sum(l_quantity) as sum_qty",
      |               "cast(sum(cast(l_extendedprice as decimal(18,2))) as double) as sum_base_price",
      |               "cast(sum(cast(l_extendedprice * (1.0 - l_discount) as decimal(18,4))) as double) as sum_disc_price",
      |               "avg(l_quantity) as avg_qty",
      |               "round(avg(l_discount), 6) as avg_disc",
      |               "count(1) as count_order"]},
      |      "is-output": true
      |    }
      |  }
      |}""".stripMargin

  val queries: Map[String, Q] = Map(
    "q60_pipeline_compiled" -> { (s, dir) =>
      val blocks = PipelineSpec.fromJson(specJson)
      DagCompiler.runPipeline(
        blocks("Main"), TransformRegistry.empty,
        data = Map("lineitem" -> Tables.load(s, dir, "lineitem")),
        params = Map.empty, spark = Some(s)).asInstanceOf[DataFrame]
    },
  )

  val oracles: Map[String, String] = Map(
    // same statement as q01_agg — the pipeline must agree with both
    // DuckDB and (transitively) the native DataFrame implementation
    "q60_pipeline_compiled" -> RelationalCore.oracles("q01_agg"),
  )
}
