package graft

import graft.functions.ConeContainsFn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge

/** The SparkSessionExtensions seam: the ConeJoinRewrite optimizer
  * rule turns a declarative cone_contains theta join into a band
  * equi-join — identical results, no nested-loop join. */
class ExtensionsSpec extends SparkSpec {

  private def catalog(s: SparkSession): DataFrame =
    s.range(20000).select(
      col("id").as("object_id"),
      ((col("id") * 7919) % 36000).cast("double").divide(100.0).as("ra"),
      (((col("id") * 104729) % 17000).cast("double") / 100.0 - 85.0).as("dec"))

  private def samples(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((0L, 1.0, 0.0, 3.0), (1L, 359.5, 10.0, 2.0), (2L, 180.0, -80.0, 5.0),
      (3L, 90.0, 45.0, 1.0), (4L, 270.0, 80.0, 4.0))
      .toDF("sample_id", "s_ra", "s_dec", "radius_deg")
  }

  private def coneQuery(s: SparkSession): DataFrame =
    catalog(s).join(samples(s), ConeContainsFn.coneContains(
      col("ra"), col("dec"), col("s_ra"), col("s_dec"), col("radius_deg")))

  private def key(df: DataFrame): Set[(Long, Long)] =
    df.select(col("sample_id"), col("object_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rule rewrites the cone theta join to a band equi-join with identical results") {
    val q = coneQuery(spark)
    val naivePlan = q.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"), naivePlan)
    val baseline = key(q)
    assert(baseline.nonEmpty)

    val rewritten = graftbridge.ofRows(spark,
      new graft.plans.ConeJoinRewrite(spark).apply(q.queryExecution.analyzed))
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("graft_band"), plan)
    assert(key(rewritten) === baseline)
    assert(rewritten.columns.toSeq === q.columns.toSeq)
  }

  test("rule leaves non-cone joins and equi-joins untouched") {
    val rule = new graft.plans.ConeJoinRewrite(spark)
    val equi = catalog(spark).as("a")
      .join(samples(spark), col("object_id") === col("sample_id"))
    assert(rule.apply(equi.queryExecution.analyzed)
      .sameResult(equi.queryExecution.analyzed))
  }

  test("rule rewrites a rect_contains theta join to a band equi-join with identical results") {
    import spark.implicits._
    val rectSamples = Seq(
      (0L, 1.0, 0.0, 6.0, 3.0), (1L, 359.5, 10.0, 4.0, 2.0),
      (2L, 180.0, -80.0, 10.0, 5.0), (3L, 90.0, 45.0, 2.0, 1.0))
      .toDF("sample_id", "s_ra", "s_dec", "width_deg", "height_deg")
    val q = catalog(spark).join(rectSamples, ConeContainsFn.rectContains(
      col("ra"), col("dec"), col("s_ra"), col("s_dec"),
      col("width_deg"), col("height_deg")))
    val baseline = key(q)
    assert(baseline.nonEmpty)
    assert(q.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val rewritten = graftbridge.ofRows(spark,
      new graft.plans.ConeJoinRewrite(spark).apply(q.queryExecution.analyzed))
    assert(!rewritten.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(key(rewritten) === baseline)
  }

  test("rule handles the sample table on the LEFT side") {
    val rule = new graft.plans.ConeJoinRewrite(spark)
    val q = samples(spark).join(catalog(spark), ConeContainsFn.coneContains(
      col("ra"), col("dec"), col("s_ra"), col("s_dec"), col("radius_deg")))
    val rewritten = graftbridge.ofRows(spark,
      rule.apply(q.queryExecution.analyzed))
    assert(!rewritten.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(key(rewritten) === key(q))
    assert(rewritten.columns.toSeq === q.columns.toSeq)
  }

  test("rule does NOT fire on a cone predicate under OR (band restriction would drop rows)") {
    val rule = new graft.plans.ConeJoinRewrite(spark)
    val cone = ConeContainsFn.coneContains(
      col("ra"), col("dec"), col("s_ra"), col("s_dec"), col("radius_deg"))
    val disjunctive = catalog(spark).join(samples(spark),
      cone || col("object_id") % 1000 === col("sample_id"))
    val analyzed = disjunctive.queryExecution.analyzed
    assert(rule.apply(analyzed).sameResult(analyzed))
    // but cone AND extra-conjunct still rewrites (the residual keeps
    // the extra predicate)
    val conjunctive = catalog(spark).join(samples(spark),
      cone && col("object_id") % 2 === 0)
    val rewritten = graftbridge.ofRows(spark,
      rule.apply(conjunctive.queryExecution.analyzed))
    assert(!rewritten.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(key(rewritten) === key(conjunctive))
  }

  test("GraftExtensions installs the rewrite session-wide") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the programmatic form of
      // spark.sql.extensions=graft.GraftExtensions (the config-string
      // route applies the same class, but only when the SparkContext
      // itself is created with it — the tests share one context)
      val ext = SparkSession.builder()
        .master("local[4]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new graft.GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val q = coneQuery(ext)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("graft_band"), plan)
      // identical rows to the un-extended session's nested-loop answer
      assert(key(q) === key(coneQuery(spark)))
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
