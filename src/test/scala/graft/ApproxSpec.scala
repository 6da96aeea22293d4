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

  test("owned sketches (q55b): estimates bounded against exact values") {
    // larger scale → the 4096-register HLL's ~1.6% standard error is
    // the operative bound; 5% allows 3 sigma
    val dir = "/root/testdata/sf0.01"
    val li = Tables.load(spark, dir, "lineitem")
    val eParts = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact DISCRETE quantiles (value at rank ⌈q·n⌉) — the sketch's
    // own definition; the interpolated `percentile` can step past a
    // bucket edge between two data points
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag").orderBy(col("v"))
    val ranked = li.select(col("l_returnflag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)").as("v"))
      .withColumn("rn", row_number().over(w))
    val eQuant = ranked.groupBy("l_returnflag").agg(max("rn").as("n"))
      .join(ranked, "l_returnflag")
      .filter(col("rn") === expr("(n + 1) div 2") ||
        col("rn") === expr("(9 * n + 9) div 10"))
      .groupBy("l_returnflag").agg(min("v").as("v50"), max("v").as("v90"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val width = 8192L
    val got = graft.operators.ApproxAggs.queries("q55b_owned_sketches")(spark, dir)
      .collect()
    assert(got.length === eParts.size)
    got.foreach { r =>
      val k = r.getString(0)
      // the digest's est is the RAW harmonic estimate (gate-exact);
      // the user-facing estimate applies the small-range correction
      val est = graft.functions.HllSketch.estimate(r.getInt(2), r.getDouble(4))
      assert(math.abs(est - eParts(k)) / eParts(k) < 0.05,
        s"$k: owned HLL $est vs exact ${eParts(k)}")
      // the bucket [lower, lower + width) must CONTAIN the discrete
      // quantile — the sketch's error bound is exactly one bucket
      val (e50, e90) = eQuant(k)
      val p50 = r.getLong(6)
      val p90 = r.getLong(7)
      assert(e50 >= p50 && e50 < p50 + width,
        s"$k: p50 bucket [$p50, ${p50 + width}) vs exact discrete $e50")
      assert(e90 >= p90 && e90 < p90 + width,
        s"$k: p90 bucket [$p90, ${p90 + width}) vs exact discrete $e90")
    }
  }

  test("owned Count-Min (q95): one-sided, within the epsilon-N bound, merge-independent") {
    val dir = "/root/testdata/sf0.01"
    // the query's OWN probe list — index-aligned with its est_* output
    // columns, so a probe reorder can't silently misalign this test
    val probes = graft.operators.ApproxAggs.CmProbes
    // exact per-(lang, probe-token) occurrence counts
    val li = Tables.load(spark, dir, "documents")
    val exact = li.select(col("lang"),
        explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(probes: _*))
      .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = graft.operators.ApproxAggs.queries("q95_countmin_tokens")(spark, dir)
      .collect()
    got.foreach { r =>
      val lang = r.getString(0)
      val n = r.getLong(1)
      probes.zipWithIndex.foreach { case (t, i) =>
        val est = r.getLong(6 + i)
        val truth = exact.getOrElse((lang, t), 0L)
        // CMS is one-sided (collisions only ADD) ...
        assert(est >= truth, s"$lang/$t: est $est < true $truth")
        // ... and bounded: excess ≤ ~3·N/width with d=4 rows
        assert(est <= truth + 3L * n / 1024L + 1,
          s"$lang/$t: est $est exceeds true $truth + 3N/w (N=$n)")
      }
    }
    // partitioning independence of the full digest
    def digest(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .groupBy(col("lang"))
      .agg(graft.functions.Sketches.countMin(
        graft.functions.Text.tokens(col("text")),
        graft.operators.ApproxAggs.CmSalt, graft.operators.ApproxAggs.CmDepth,
        graft.operators.ApproxAggs.CmWidth, probes).as("s"))
      .orderBy("lang").collect().map(_.toString).toSeq
    assert(digest(li.repartition(1)) === digest(li.repartition(13, col("doc_id"))))
  }

  test("q188: width frontier — one-sided everywhere, driver replay at width 8, the bracketing gradient") {
    val d = Tables.load(spark, sf0001, "documents")
    val out = graft.operators.ApproxAggs.cmsWidthFrontier(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val probes = graft.operators.ApproxAggs.CmProbes
    assert(out.length === 3 * probes.length)
    assert(out.forall(r => r._2 === 4 * r._1)) // counters = depth·width
    // CMS is one-sided: collisions only ADD (structural)
    assert(out.forall(r => r._6 >= r._5 && r._7 === r._6 - r._5))
    // exact column replays an independent count
    val exact = d.select(explode(graft.functions.Text.tokens(col("text")))
        .as("tok")).filter(col("tok").isin(probes: _*))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r._5 === exact.getOrElse(r._3, 0L), r.toString))
    // width 8 sits BELOW the 31-token vocabulary → real collisions;
    // the shipped 1024 is collision-free on it (the sizing decision
    // the table exists to expose)
    assert(out.filter(_._1 == 8L).map(_._7).sum > 0L, "w=8 must collide")
    assert(out.filter(_._1 == 1024L).forall(_._7 === 0L), "w=1024 clears")
    // full driver replay of the width-8 estimates (the same kernel
    // arithmetic, independently evaluated)
    import graft.functions.SplitMix64Kernel
    val toks = d.select(explode(graft.functions.Text.tokens(col("text")))
      .as("tok")).collect().map(_.getString(0))
    val buf = Array.fill(4, 8)(0L)
    toks.foreach { t =>
      val th = SplitMix64Kernel.strHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      (0 until 4).foreach { j =>
        val b = (SplitMix64Kernel.mix(th +
          (graft.operators.ApproxAggs.CmSalt + j) * SplitMix64Kernel.Golden)
          & 7L).toInt
        buf(j)(b) += 1L
      }
    }
    probes.foreach { t =>
      val th = SplitMix64Kernel.strHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      val want = (0 until 4).map { j =>
        buf(j)((SplitMix64Kernel.mix(th +
          (graft.operators.ApproxAggs.CmSalt + j) * SplitMix64Kernel.Golden)
          & 7L).toInt)
      }.min
      assert(out.find(r => r._1 == 8L && r._3 == t).get._6 === want, t)
    }
  }

  test("q191: histogram width frontier — one-bucket guarantee at every width, exact quantiles replay") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val out = graft.operators.ApproxAggs.histWidthFrontier(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))).sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(512L, 8192L, 131072L))
    // constant coverage: buckets·width identical for every row
    assert(out.map(r => r._1 * r._2).distinct.length === 1)
    assert(out.map(_._3).distinct.length === 1)
    assert(out.head._3 === li.count())
    // exact quantiles are width-independent
    assert(out.map(_._6).distinct.length === 1)
    assert(out.map(_._7).distinct.length === 1)
    // the sketch's ONE-BUCKET guarantee, measured: 0 <= err < width
    out.foreach { r =>
      assert(r._8 >= 0 && r._8 < r._1, s"p50 err outside [0, w): $r")
      assert(r._9 >= 0 && r._9 < r._1, s"p90 err outside [0, w): $r")
      assert(r._8 === r._6 - r._4 && r._9 === r._7 - r._5)
    }
    // driver replay of the exact discrete quantiles (same rank rule)
    val cents = li.selectExpr(
      "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)")
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    def rank(t: Long): Long = cents(t.toInt - 1)
    assert(out.head._6 === rank((n + 1) / 2))
    assert(out.head._7 === rank((9L * n + 9) / 10))
  }

  test("owned sketches reject wrong-typed inputs at ANALYSIS time") {
    val li = Tables.load(spark, sf0001, "lineitem")
    // string key into the HLL; scalar into the array-typed sketches —
    // all must fail analysis, not throw ClassCastException per row in
    // a running executor
    intercept[org.apache.spark.sql.AnalysisException] {
      li.agg(graft.functions.Sketches.hllDigest(col("l_returnflag"), 1L)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      li.agg(graft.functions.Sketches.histQuantiles(col("l_returnflag"), 10L, 16)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      li.agg(graft.functions.Sketches.countMin(col("l_orderkey"), 1L, 2, 64, Seq("x"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      li.agg(graft.functions.Sketches.bloom(col("l_orderkey"), 1L, 64, 2)).collect()
    }
  }

  test("owned HLL: raw-regime estimate accurate at sf0.1 (n >> m, no correction branch)") {
    val dir = "/root/testdata/sf0.1"
    val li = Tables.load(spark, dir, "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.operators.ApproxAggs.queries("q55b_owned_sketches")(spark, dir)
      .collect().foreach { r =>
        val k = r.getString(0)
        val raw = r.getDouble(4)
        // 20000 distinct keys >> 2.5·4096: estimate() must return the
        // RAW harmonic estimate unchanged, and it must be accurate
        assert(graft.functions.HllSketch.estimate(r.getInt(2), raw) === raw)
        assert(math.abs(raw - exact(k)) / exact(k) < 0.05,
          s"$k: raw-regime HLL $raw vs exact ${exact(k)}")
      }
  }

  test("owned sketches are partitioning-independent (cluster determinism)") {
    val li = Tables.load(spark, sf0001, "lineitem")
    def digest(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .groupBy(col("l_returnflag"))
      .agg(graft.functions.Sketches.hllDigest(col("l_partkey"), 55L).as("h"),
        graft.functions.Sketches.histQuantiles(
          expr("CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)"),
          8192L, 2048).as("q"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val a = digest(li.repartition(1))
    val b = digest(li.repartition(17, col("l_orderkey")))
    assert(a === b, "sketch digests differ across partitionings")
  }
}
