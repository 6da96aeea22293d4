package graft

import graft.functions.SplitMix64Kernel
import org.apache.spark.sql.functions._

/** Pins the corpus-mixing operators (q88/q89/q90) to driver-side
  * replays of their own definitions, and their determinism contract
  * (partitioning-independence — the property that makes a
  * 1000-executor run equal local[32] bit for bit). */
class MixingSpec extends SparkSpec {

  private val Golden = SplitMix64Kernel.Golden

  private def docs = Tables.load(spark, sf0001, "documents")

  test("q88: stratified sample is partitioning-independent and hits its strata") {
    val q = SparkEntry.queries("q88_stratified_sample")
    val base = q(spark, sf0001).collect().map(_.getLong(0)).toSet

    // same filter over a deliberately weird partitioning
    val u = graft.functions.SplitMix64.uniform(col("doc_id"), 88L)
    val rate = when(col("lang") === "en", lit(0.5))
      .when(col("lang") === "zh", lit(0.75)).otherwise(lit(1.0))
    val weird = docs.repartition(7).filter(u < rate)
      .collect().map(_.getLong(0)).toSet
    assert(base === weird)

    // driver replay of the exact same draw
    val langs = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = langs.collect { case (id, lang)
        if SplitMix64Kernel.uniform(id, 88L * Golden) <
          (lang match { case "en" => 0.5; case "zh" => 0.75; case _ => 1.0 }) => id
    }.toSet
    assert(base === expected)

    // non-downsampled strata are kept whole
    val keptOther = base.count(id => langs(id) != "en" && langs(id) != "zh")
    val totalOther = langs.values.count(l => l != "en" && l != "zh")
    assert(keptOther === totalOther)
  }

  test("q89: temperature rates are the IEEE-exact sqrt ratios; rarest language keeps 100%") {
    val rows = SparkEntry.queries("q89_temperature_mix")(spark, sf0001).collect()
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min

    // every emitted rate_ppm is floor(1e6 * sqrt(nmin/n_lang)) exactly
    rows.foreach { r =>
      val lang = r.getString(1)
      val expect = math.floor(math.sqrt(nMin.toDouble / counts(lang)) * 1000000.0).toLong
      assert(r.getLong(2) === expect, s"rate_ppm for $lang")
    }

    // the rarest language is kept in full (rate exactly 1.0, and a
    // [0,1) draw is always < 1.0)
    val rarest = counts.minBy(_._2)._1
    val keptRarest = rows.count(_.getString(1) == rarest)
    assert(keptRarest === counts(rarest).toInt)

    // kept fraction of the most common language is near its rate
    // (binomial 4-sigma band)
    val biggest = counts.maxBy(_._2)._1
    val p = math.sqrt(nMin.toDouble / counts(biggest))
    val n = counts(biggest).toDouble
    val kept = rows.count(_.getString(1) == biggest)
    assert(math.abs(kept - n * p) < 4 * math.sqrt(n * p * (1 - p)) + 1,
      s"$biggest kept $kept of $n at rate $p")
  }

  test("q90: shard packing equals a driver-side greedy replay") {
    val out = SparkEntry.queries("q90_shard_pack")(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3)))).toMap

    val toks = docs
      .selectExpr("doc_id", "CAST(size(split(text, '\\\\s+')) AS BIGINT) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // replay: shard by draw, order by (draw, id), pack greedily
    val byShard = toks.keys.toSeq
      .map { id =>
        val u = SplitMix64Kernel.uniform(id, 90L * Golden)
        (id, u, math.floor(u * 16).toInt)
      }
      .groupBy(_._3)
    byShard.foreach { case (shard, members) =>
      var cum = 0L
      members.sortBy { case (id, u, _) => (u, id) }.foreach { case (id, _, _) =>
        val bin = cum / 512L
        assert(out(id) === ((shard, toks(id), bin)), s"doc $id in shard $shard")
        cum += toks(id)
      }
    }

    // every doc assigned exactly once
    assert(out.size === toks.size)
  }

  test("q107: pack-boundary audit equals a driver-side replay of the greedy pack") {
    val out = SparkEntry.queries("q107_pack_audit")(spark, sf0001).collect()
      .map(r => ((r.getInt(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    val toks = docs
      .selectExpr("doc_id", "CAST(size(split(text, '\\\\s+')) AS BIGINT) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // replay the q90 pack, then fold the audit per (shard, bin)
    val want = scala.collection.mutable.Map[(Int, Long), (Long, Long, Long, Long)]()
    toks.keys.toSeq
      .map { id =>
        val u = SplitMix64Kernel.uniform(id, 90L * Golden)
        (id, u, math.floor(u * 16).toInt)
      }
      .groupBy(_._3)
      .foreach { case (shard, members) =>
        var cum = 0L
        members.sortBy { case (id, u, _) => (u, id) }.foreach { case (id, _, _) =>
          val n = toks(id)
          val bin = cum / 512L
          cum += n
          val endBin = (cum - 1) / 512L
          val (d0, t0, c0, m0) = want.getOrElse((shard, bin), (0L, 0L, 0L, 0L))
          want((shard, bin)) =
            (d0 + 1, t0 + n, c0 + (if (endBin != bin) 1L else 0L), math.max(m0, cum))
        }
      }
    val wantFinal = want.map { case (k @ (_, bin), (d, t, c, maxCum)) =>
      k -> (d, t, c, math.max(maxCum - (bin + 1) * 512L, 0L))
    }.toMap
    assert(out === wantFinal)
    // conservation: every doc starts in exactly one sequence bin
    assert(out.values.map(_._1).sum === toks.size.toLong)
  }

  test("q91: two-phase per-group sample equals the global ranking it short-cuts") {
    val out = SparkEntry.queries("q91_per_group_sample")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    // independent driver replay: rank ALL docs per lang by (u, id)
    val expected = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).toSeq
      .flatMap { case (lang, members) =>
        members
          .map { case (id, _) => (id, SplitMix64Kernel.uniform(id, 91L * Golden)) }
          .sortBy { case (id, u) => (u, id) }
          .take(20)
          .zipWithIndex
          .map { case ((id, _), i) => (id, lang, (i + 1).toLong) }
      }.toSet
    assert(out === expected)

    // exactly min(20, n_lang) per language
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.size === math.min(20L, counts(lang)).toInt, lang)
    }
  }

  test("q90: packing is partitioning-independent") {
    val a = SparkEntry.queries("q90_shard_pack")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3))).toSet
    // recompute over a skewed repartition of the same input — the
    // window is keyed by shard and ordered by (u, doc_id), neither of
    // which depends on layout
    val u = graft.functions.SplitMix64.uniform(col("doc_id"), 90L)
    val d = docs.repartition(3)
      .select(col("doc_id"),
        expr("CAST(size(split(text, '\\\\s+')) AS BIGINT)").as("n_tokens"),
        u.as("u"))
      .withColumn("shard", floor(col("u") * 16).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("u"), col("doc_id"))
    val b = d.withColumn("cum", sum(col("n_tokens")).over(w))
      .selectExpr("doc_id", "shard", "(cum - n_tokens) div 512 AS bin")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("q90: shard assignment stays balanced under adversarial data skew") {
    import spark.implicits._
    // worst-case input: ONE language, ONE source, zipf-ish document
    // lengths (one giant doc, long tail of tiny ones), consecutive
    // ids. Shard = splitmix64(doc_id) — independent of every data
    // column — so rows spread uniformly no matter how skewed the
    // corpus is; token sums follow once no single doc dominates a
    // shard's worth of tokens.
    val n = 5000
    val rows = (0 until n).map { i =>
      val words = if (i == 0) 2000 else 1 + (i % 37)
      (i.toLong, Seq.fill(words)("w").mkString(" "))
    }
    val skewed = rows.toDF("doc_id", "text").repartition(5)
    val packed = graft.operators.Mixing.shardPack(skewed)
    val byShard = packed.groupBy("shard")
      .agg(count(lit(1)).as("rows"), sum("n_tokens").as("toks"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(byShard.length === 16, "all 16 shards populated")
    val rowCounts = byShard.map(_._1.toDouble)
    val tokSums = byShard.map(_._2.toDouble)
    val rowSkew = rowCounts.max / (rowCounts.sum / 16)
    val tokSkew = tokSums.max / (tokSums.sum / 16)
    assert(rowSkew < 1.2, s"row skew $rowSkew")
    // the planted giant doc (2000 tokens vs ~6000/shard) lands
    // somewhere; even so token sums must stay within ~1.5x of mean
    assert(tokSkew < 1.5, s"token skew $tokSkew")
  }
}
