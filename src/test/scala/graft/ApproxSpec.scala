package graft

/** Sketch aggregates bounded against exact values (q55 is rows-only
  * for the driver — sketches are engine-specific). */
class ApproxSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("HLL count-distinct within its standard error; approx median near exact") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("parts"),
        expr("percentile(l_extendedprice, 0.5)").as("median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = graft.operators.ApproxAggs.queries("q55_sketch_aggs")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    approx.foreach { case (k, (aParts, aMed)) =>
      val (eParts, eMed) = exact(k)
      assert(math.abs(aParts - eParts).toDouble / eParts < 0.1,
        s"$k: HLL $aParts vs exact $eParts")
      assert(math.abs(aMed - eMed) / eMed < 0.05,
        s"$k: approx median $aMed vs exact $eMed")
    }
  }
}
