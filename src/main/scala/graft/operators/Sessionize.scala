package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization of the events table, both ways:
  *
  *  - q51: explicit lag/cumsum session assignment (window functions) —
  *    the portable SQL formulation, DuckDB-oracle-checked.
  *  - q52: Spark's native `session_window` in batch mode — checked
  *    against the SAME gap-based DuckDB formulation, proving the
  *    built-in operator's semantics (merge when gap < 30 min, new
  *    session when ≥) equal the windowed reformulation. The streaming
  *    module (graft.streaming.EventStreams) reuses the identical
  *    operator with a watermark.
  */
object Sessionize {
  type Q = (SparkSession, String) => DataFrame

  private val gapMinutes = 30

  val queries: Map[String, Q] = Map(
    "q51_sessionize_lag" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val withGap = ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            col("ts") >= col("prev_ts") + expr(s"INTERVAL $gapMinutes MINUTE"), 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      withGap.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
    },

    "q52_session_window" -> { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("session_value"))
    },
  )

  val oracles: Map[String, String] = Map(
    // the cumulative-sum window carries the SAME (ts, event_id)
    // tie-break as the Spark window — ORDER BY ts alone made session
    // assignment nondeterministic on duplicate timestamps (round-1
    // advice)
    "q51_sessionize_lag" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         |    lag(CAST(ts AS TIMESTAMP)) OVER
         |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
         |      AS prev_ts
         |  FROM events),
         |m AS (
         |  SELECT user_id, event_id, ts, value,
         |    CASE WHEN prev_ts IS NULL
         |           OR ts >= prev_ts + INTERVAL $gapMinutes MINUTE
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM e),
         |sess AS (
         |  SELECT user_id, ts, value,
         |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS session_id
         |  FROM m)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
         |FROM sess
         |GROUP BY user_id, session_id""".stripMargin,

    "q52_session_window" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         |    lag(CAST(ts AS TIMESTAMP)) OVER
         |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
         |      AS prev_ts
         |  FROM events),
         |m AS (
         |  SELECT user_id, event_id, ts, value,
         |    CASE WHEN prev_ts IS NULL
         |           OR ts >= prev_ts + INTERVAL $gapMinutes MINUTE
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM e),
         |sess AS (
         |  SELECT user_id, ts, value,
         |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM m)
         |SELECT user_id, min(ts) AS session_start,
         |  max(ts) + INTERVAL $gapMinutes MINUTE AS session_end,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
         |FROM sess
         |GROUP BY user_id, session_id""".stripMargin,
  )
}
