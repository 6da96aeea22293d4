package graft.operators

import graft.Tables
import graft.functions.{NGrams, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level lexical statistics: PMI collocation mining (Church &
  * Hanks 1990) and a Zipf-law exponent fit (the tokenizer/corpus
  * health diagnostic — natural text has slope ≈ −1; generated or
  * templated text departs sharply). The reference's analysis layer
  * (/root/reference/src/cosmap/analysis/runner.py) has per-sample
  * scoring only — these extend the engine per the brief's
  * training-data mandate, like Dedup/Similarity/Curation.
  *
  * Cross-engine exactness (the proven house contract): counts stay
  * integers; each transcendental is ONE shared-op-tree expression
  * quantized to integer micro-nats immediately (round-6 rule);
  * big-product sums ride DECIMAL(38,0) in Spark ↔ HUGEINT in DuckDB
  * (both exact 128-bit-class integer arithmetic); possibly-negative
  * integral divisions use the q108 +shift trick so Spark's truncating
  * `div` and DuckDB's flooring `//` agree.
  */
object LexicalStats {
  type Q = (SparkSession, String) => DataFrame

  /** q126 constants: minimum pair count, output size. */
  private[graft] val PmiMinCount = 5
  private[graft] val PmiTop = 100

  /** q128 constants: rank-strip width (bounds every generated array
    * and parallelizes the huge hapax frequency class), div shifts. */
  private[graft] val Strip = 65536L
  private[graft] val SlopeShift = 10000000L   // |slope| < 10
  private[graft] val InterceptShift = 1000000000L

  val queries: Map[String, Q] = Map(
    // -- q126: top-100 adjacent-bigram collocations by pointwise
    //    mutual information, count floor 5. PMI compares the bigram's
    //    observed rate against independence:
    //    pmi = ln(p(ab) / (p(a)·p(b))) with p(ab) = c_ab/Nb,
    //    p(w) = c_w/N — one ln over one shared-order double quotient,
    //    quantized to micro-nats (ties then break on the pair).
    //    Scale shape: bigram/unigram counting is two keyed groupBys
    //    with map-side partials; the count attach is two
    //    vocabulary-scale equi-joins (hinted off broadcast — at
    //    crawl scale the unigram table is 10⁷+ rows); the totals are
    //    1-row broadcast dims; the top-100 is TakeOrderedAndProject
    //    (driver state bounded at any corpus size). --
    "q126_pmi_collocations" -> { (s, dir) =>
      pmi(Tables.load(s, dir, "documents"))
    },
    "q128_zipf_fit" -> { (s, dir) =>
      zipf(Tables.load(s, dir, "documents"))
    },
  )

  /** q126 over any (text) frame — exposed for the spec's replay. */
  private[graft] def pmi(d: DataFrame): DataFrame = {
      val toks = d.select(explode(Text.tokens(col("text"))).as("w"))
      val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      val pairs = d
        .select(explode(NGrams.wordNGramsAll(
          Text.tokens(col("text")), 2)).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("c_ab"))
        // tokens are \s+-split, so the gram splits back losslessly
        .select(split(col("g"), " ").getItem(0).as("w1"),
          split(col("g"), " ").getItem(1).as("w2"), col("c_ab"))
      val nTok = toks.agg(count(lit(1)).as("n_tok"))
      val nBig = pairs.agg(sum(col("c_ab")).as("nb"))
      val scored = pairs
        .filter(col("c_ab") >= PmiMinCount)
        .join(uni.select(col("w").as("w1"), col("c").as("c_a"))
          .hint("shuffle_merge"), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c_b"))
          .hint("shuffle_merge"), "w2")
        .crossJoin(broadcast(nTok))
        .crossJoin(broadcast(nBig))
        .selectExpr("w1", "w2", "c_ab", "c_a", "c_b",
          // one quotient, one ln, one round — the shared op tree
          """CAST(round(ln(
            |  (CAST(c_ab AS DOUBLE) * CAST(n_tok AS DOUBLE) * CAST(n_tok AS DOUBLE))
            |  / (CAST(nb AS DOUBLE) * CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))
            |) * 1000000) AS BIGINT) AS pmi_unats""".stripMargin)
      val top = scored
        .orderBy(col("pmi_unats").desc, col("w1"), col("w2"))
        .limit(PmiTop)
      top.withColumn("rank", row_number().over(
        Window.orderBy(col("pmi_unats").desc, col("w1"), col("w2")))
        .cast("long"))
  }

    // -- q128: least-squares fit of ln(freq) on ln(rank) over the
    //    whole vocabulary — WITHOUT a global vocabulary sort. Ranks
    //    within a frequency class are assignment-independent for
    //    every regression sum (y is constant inside a class), so the
    //    class table (count-of-counts, √-sized: m(m+1)/2 ≤ N) plus
    //    its cumulative offsets determines the exact rank multiset;
    //    classes explode into ≤ Strip-wide rank strips (bounded
    //    arrays, and the huge hapax class parallelizes across
    //    strips). Regression sums ride DECIMAL(38,0)/HUGEINT; the
    //    closed-form slope/intercept are shift-guarded integral
    //    divisions. Output: ONE row — n_types, n_tokens,
    //    zipf_slope_micro (≈ −1e6 for natural text),
    //    zipf_intercept_unats. --
  /** q128 over any (text) frame — exposed for the spec's replay. */
  private[graft] def zipf(d: DataFrame): DataFrame = {
      val vocab = d.select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val cls = vocab.groupBy(col("c")).agg(count(lit(1)).as("m"))
      // offsets over the √-sized class table (tiny global window)
      val ofs = cls.withColumn("s", coalesce(
        sum(col("m")).over(Window.orderBy(col("c").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val ranks = ofs
        .selectExpr("c", "m", "s",
          s"explode(sequence(0L, (m - 1) div $Strip)) AS strip")
        .selectExpr("c",
          s"explode(sequence(s + 1 + strip * $Strip, least(s + m, s + strip * $Strip + $Strip))) AS r")
      val xy = ranks.selectExpr(
        "CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x",
        "CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS y")
      val ag = xy.agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(expr("CAST(x * x AS DECIMAL(38,0))")).as("sxx"),
        sum(expr("CAST(x * y AS DECIMAL(38,0))")).as("sxy"))
      val tot = cls.agg(sum(col("c") * col("m")).as("n_tokens"))
      ag.crossJoin(broadcast(tot))
        .selectExpr(
          "CAST(n AS BIGINT) AS n_types", "n_tokens",
          s"""((n * sxy - sx * sy) * 1000000 + $SlopeShift * (n * sxx - sx * sx))
             |  div (n * sxx - sx * sx) - $SlopeShift AS zipf_slope_micro""".stripMargin,
          "n", "sx", "sy")
        .selectExpr("n_types", "n_tokens", "zipf_slope_micro",
          // n stays DECIMAL here: InterceptShift * n * 1e6 overflows
          // BIGINT once the vocabulary passes ~9k types
          s"""((sy * 1000000 - zipf_slope_micro * sx) + $InterceptShift * (n * 1000000))
             |  div (n * 1000000) - $InterceptShift AS zipf_intercept_unats""".stripMargin)
  }

  // ---- DuckDB oracles (same constants and op trees) ----------------

  private def oracle126: String =
    s"""WITH tok AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
       |uni AS (
       |  SELECT w, count(*) AS c
       |  FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w),
       |pc AS (
       |  SELECT w1, w2, count(*) AS c_ab FROM (
       |    SELECT t[i] AS w1, t[i+1] AS w2
       |    FROM (SELECT t, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
       |          FROM tok))
       |  GROUP BY w1, w2),
       |tot AS (SELECT count(*) AS n_tok FROM (SELECT unnest(t) FROM tok)),
       |totb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS nb FROM pc),
       |p AS (
       |  SELECT w1, w2, c_ab, a.c AS c_a, b.c AS c_b,
       |    CAST(round(ln(
       |      (CAST(c_ab AS DOUBLE) * CAST(n_tok AS DOUBLE) * CAST(n_tok AS DOUBLE))
       |      / (CAST(nb AS DOUBLE) * CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE))
       |    ) * 1000000) AS BIGINT) AS pmi_unats
       |  FROM pc JOIN uni a ON pc.w1 = a.w JOIN uni b ON pc.w2 = b.w
       |  CROSS JOIN tot CROSS JOIN totb
       |  WHERE c_ab >= $PmiMinCount)
       |SELECT w1, w2, c_ab, c_a, c_b, pmi_unats, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT *, row_number() OVER (
       |        ORDER BY pmi_unats DESC, w1, w2) AS rank FROM p)
       |WHERE rank <= $PmiTop""".stripMargin

  private def oracle128: String =
    s"""WITH tokx AS (
       |  SELECT unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
       |vocab AS (SELECT tok, count(*) AS c FROM tokx GROUP BY tok),
       |cls AS (SELECT c, count(*) AS m FROM vocab GROUP BY c),
       |ofs AS (
       |  SELECT c, m, CAST(coalesce(sum(m) OVER (ORDER BY c DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
       |  FROM cls),
       |strips AS (
       |  SELECT c, m, s, unnest(generate_series(0, (m - 1) // $Strip)) AS strip
       |  FROM ofs),
       |rk AS (
       |  SELECT c, unnest(generate_series(s + 1 + strip * $Strip,
       |    least(s + m, s + strip * $Strip + $Strip))) AS r
       |  FROM strips),
       |xy AS (
       |  SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
       |    CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS y
       |  FROM rk),
       |ag AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS n,
       |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
       |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
       |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
       |  FROM xy),
       |tot AS (
       |  SELECT CAST(sum(CAST(c AS HUGEINT) * CAST(m AS HUGEINT)) AS BIGINT)
       |    AS n_tokens FROM cls),
       |sl AS (
       |  SELECT n, sx, sy, n_tokens,
       |    ((n * sxy - sx * sy) * 1000000 + $SlopeShift * (n * sxx - sx * sx))
       |      // (n * sxx - sx * sx) - $SlopeShift AS slope
       |  FROM ag CROSS JOIN tot)
       |SELECT CAST(n AS BIGINT) AS n_types, n_tokens,
       |  CAST(slope AS BIGINT) AS zipf_slope_micro,
       |  CAST(((sy * 1000000 - slope * sx) + $InterceptShift * (n * 1000000))
       |    // (n * 1000000) - $InterceptShift AS BIGINT) AS zipf_intercept_unats
       |FROM sl""".stripMargin

  val oracles: Map[String, String] = Map(
    "q126_pmi_collocations" -> oracle126,
    "q128_zipf_fit" -> oracle128,
  )
}
