package graft.operators

import graft.Tables
import graft.functions.{NGrams, SplitMix64, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Targeted-curation operators — the retrieval / importance-sampling
  * layer of a training-data pipeline (the reference stops at
  * per-sample analysis, /root/reference/src/cosmap/analysis/runner.py;
  * these extend the engine per the brief's training-data mandate, like
  * the Dedup/Similarity/Mixing families):
  *
  *  - q100 BM25 top-k retrieval: the inverted-index scorer behind
  *    quality retrieval and contamination search (Robertson-Spärck
  *    Jones BM25, the Lucene idf variant ln(1+(N-df+.5)/(df+.5))).
  *  - q101 DSIR importance resampling (Xie et al. 2023, "Data
  *    Selection for Language Models via Importance Resampling"):
  *    hashed-bigram bag features, per-bucket log likelihood ratio
  *    target-vs-raw, Gumbel top-k = sampling without replacement
  *    proportional to the importance weights.
  *  - q103 bigram-LM surprisal: the conditional upgrade of q85's
  *    unigram model — add-1-smoothed p(w2|w1), per-doc mean token
  *    surprisal (the CCNet-style LM quality filter, Wenzek et al.
  *    2020, re-expressed relationally).
  *
  * Cross-engine exactness follows the house rules (CLAUDE.md):
  * integer counts shuffle, single IEEE divisions stay exact, every
  * transcendental (ln) is quantized to integer micro-nats BEFORE any
  * summation, sums/ranks are integer-exact on any partitioning.
  *
  * Scale shapes (the 100 TB posture):
  *  - q100: the tiny query-term dim broadcasts INTO the token explode
  *    so only matching occurrences survive the scan stage; doc length
  *    is map-side (size(split)); avgdl is one scalar broadcast; df is
  *    a ≤|terms|-row broadcast; the only corpus-keyed shuffle is the
  *    (query, term, doc) tf groupBy over matched occurrences, and the
  *    final top-10 window partitions by query_id.
  *  - q101: one bucket-keyed groupBy (B=1024 buckets → the λ table is
  *    a broadcast dim), one (doc, bucket) groupBy, a global top-64 via
  *    orderBy+limit (TakeOrderedAndProject — bounded on the driver,
  *    never a full sort) with the rank window over the 64 survivors.
  *  - q103: unigram + bigram count tables are keyed groupBys
  *    (map-side combined); scoring joins are inverted-index equi-joins
  *    on the gram/token key; V is one scalar broadcast. Everything
  *    linear in corpus tokens.
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  // ---- q100 constants (shared by engine and generated oracle) ------

  /** The fixed query set: (query_id, terms). Vocabulary-resident
    * terms so every query matches a nontrivial posting list. */
  private[operators] val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("spark", "sort", "merge"),
    1 -> Seq("window", "agg", "stream"),
    2 -> Seq("customer", "query", "join"))
  private val Bm25TopK = 10

  // ---- q101 constants ----------------------------------------------

  private[operators] val DsirTarget = "src7" // the target domain
  private[operators] val DsirBuckets = 1024 // hashed-feature space
  private[operators] val DsirTopK = 64
  private val SaltGumbel = 101L

  val queries: Map[String, Q] = Map(
    // -- BM25 top-10 per query over the whitespace-token inverted
    //    index. Scores are per-term-quantized micro-nats summed as
    //    integers, so the ranking is bit-stable on any engine and any
    //    partitioning. --
    "q100_bm25_topk" -> { (s, dir) =>
      bm25TopK(Tables.load(s, dir, "documents"), Bm25Queries, Bm25TopK)
    },

    // -- DSIR importance resampling: importance weight of doc d =
    //    Σ_features ln(p_target(b)/p_raw(b)) over hashed bigram
    //    buckets (add-1 smoothed), Gumbel-perturbed top-64 = a
    //    without-replacement sample ∝ exp(weight). The Gumbel draw is
    //    the splitmix64 uniform keyed by doc_id, so the "randomness"
    //    replays bit-exactly in the oracle. --
    "q101_dsir_resample" -> { (s, dir) =>
      // global top-K: orderBy+limit → TakeOrderedAndProject (bounded);
      // the rank window then touches only the K survivors
      val top = dsirScores(Tables.load(s, dir, "documents"))
        .orderBy(col("key_unats").desc, col("doc_id"))
        .limit(DsirTopK)
      top.withColumn("rank", row_number().over(
        Window.orderBy(col("key_unats").desc, col("doc_id"))).cast("long"))
    },

    // -- add-1-smoothed bigram-LM mean surprisal per doc:
    //    p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V). Per-bigram surprisal
    //    ln((c1+V)/(c12+1)) ≥ 0 (c12 ≤ c1, V ≥ 1), quantized to
    //    micro-nats before the integer sum; docs with < 2 tokens have
    //    no bigrams and drop out of the group — identically on both
    //    engines. --
    "q103_bigram_lm" -> { (s, dir) =>
      bigramSurprisal(Tables.load(s, dir, "documents"))
    },

    // -- q120 DoReMi-style domain reweighting (Xie et al. 2023,
    //    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    //    Pretraining", made integer-exact and single-pass): each
    //    source's mixture weight is a uniform floor plus its CLIPPED
    //    EXCESS surprisal over the corpus mean — domains the corpus
    //    LM finds hard get upweighted, easy/boilerplate domains decay
    //    to the floor. The q103 bigram LM stands in for DoReMi's
    //    proxy-vs-reference loss gap. --
    "q120_domain_reweight" -> { (s, dir) =>
      domainReweight(Tables.load(s, dir, "documents"))
    },

    // -- q123 CCNet head/middle/tail perplexity bucketing (Wenzek et
    //    al. 2020): split the corpus into LM-surprisal terciles —
    //    'head' (most fluent third) is what CCNet keeps for
    //    pretraining. Terciles are computed at MILLI-NAT BIN
    //    granularity: per-doc surprisals collapse onto a bounded bin
    //    table (≤ ~20k bins for any corpus — the q119 argument), so
    //    the global-order step never touches a corpus-sized table
    //    and every doc in a bin gets the same bucket — deterministic
    //    on any engine and partitioning by construction. --
    "q123_perplexity_buckets" -> { (s, dir) =>
      perplexityBuckets(Tables.load(s, dir, "documents"))
    },
  )

  /** q123: milli-nat bucket width for the tercile bins. */
  private[graft] val PplBinUnats = 1000L

  /** Head/middle/tail assignment over any documents-shaped frame
    * (needs `doc_id`, `text`). Docs with < 2 tokens have no bigrams
    * and drop, exactly as in q103. Scale shape: the q103 chain runs
    * ONCE into a checkpoint (referenced by the bin table and the
    * assignment); bins are a tiny groupBy + one ordered cumsum
    * window; thresholds broadcast as a 1-row dim. */
  private[graft] def perplexityBuckets(d: DataFrame): DataFrame = {
    val per = bigramSurprisal(d)
      .select(col("doc_id"), col("mean_surprisal_unats").as("su"))
      .localCheckpoint(true)
    val bins = per.groupBy(expr(s"su div $PplBinUnats").as("b"))
      .agg(count(lit(1)).as("nb"))
    val thr = bins
      .withColumn("cum", expr("sum(nb) OVER (ORDER BY b)"))
      .withColumn("tot", expr("sum(nb) OVER ()"))
      .agg(
        expr("min(CASE WHEN cum >= (tot + 2) div 3 THEN b END)").as("t1"),
        expr("min(CASE WHEN cum >= (2 * tot + 2) div 3 THEN b END)").as("t2"))
    per.crossJoin(broadcast(thr))
      .selectExpr("doc_id", "su AS mean_surprisal_unats",
        s"CASE WHEN su div $PplBinUnats <= t1 THEN 'head' " +
          s"WHEN su div $PplBinUnats <= t2 THEN 'middle' " +
          "ELSE 'tail' END AS ppl_bucket")
  }

  /** CCNet head-keep over any documents-shaped frame (needs `doc_id`,
    * `text`): the q123 terciles as a FILTER — only 'head' (the most
    * fluent third, what CCNet keeps for pretraining) survives. Docs
    * with < 2 tokens have no bigrams, hence no surprisal, and drop —
    * exactly as in q103/q123 (CCNet drops undersized docs anyway).
    * The composable form the q143 pipeline chains from. */
  private[graft] def headKeep(d: DataFrame): DataFrame =
    d.join(perplexityBuckets(d).filter(col("ppl_bucket") === "head")
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")

  /** q120: the uniform-mixing floor, in micro-nats (0.1 nat). */
  private[graft] val ReweightBase = 100000L

  /** DoReMi-lite mixture weights over any documents-shaped frame
    * (needs `doc_id`, `text`, `source`). Scale shape: rides the q103
    * surprisal machinery (corpus-scale keyed groupBys), ONE
    * doc-keyed join attaching sources to scores (both sides corpus-
    * scale — hinted off broadcast), then everything else lives on the
    * ≤|sources|-row table: the global mean is derived from the
    * per-source sums (no second corpus pass), and the weight
    * normalization is an unpartitioned window over that tiny frame. */
  private[graft] def domainReweight(d: DataFrame): DataFrame = {
    val per = bigramSurprisal(d)
      .select(col("doc_id"), col("mean_surprisal_unats").as("su"))
    val bySrc = d.select(col("doc_id"), col("source"))
      .join(per.hint("shuffle_merge"), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("su")).as("ssum"))
    bySrc
      .withColumn("mean_unats", expr("ssum div n_docs"))
      .withColumn("gm", expr("sum(ssum) OVER () div sum(n_docs) OVER ()"))
      .withColumn("excess_unats", expr("greatest(mean_unats - gm, 0L)"))
      .withColumn("wraw", col("excess_unats") + lit(ReweightBase))
      .withColumn("wsum", expr("sum(wraw) OVER ()"))
      .selectExpr("source", "n_docs", "mean_unats", "excess_unats",
        "wraw * 1000000 div wsum AS weight_ppm")
  }

  // ---- composable forms (hand-corpus spec seams) -------------------

  /** BM25 top-k over any documents-shaped frame (needs `doc_id`,
    * `text`). idf and tf-norm state the exact operation sequence the
    * oracle replays: every non-ln op is a single correctly-rounded
    * IEEE op on bit-identical inputs; the ln is absorbed by the micro
    * quantization (the q85 argument). */
  private[graft] def bm25TopK(d: DataFrame,
      qs: Seq[(Int, Seq[String])], topK: Int): DataFrame = {
    val terms = d.sparkSession.createDataFrame(
      qs.flatMap { case (q, ts) => ts.map(t => (q, t)) })
      .toDF("query_id", "term")
    val dl = d.select(col("doc_id"),
      size(Text.tokens(col("text"))).cast("long").as("dl"))
    val st = dl.agg(sum(col("dl")).as("sdl"), count(lit(1)).as("nd"))
    val m = d.select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
      .join(broadcast(terms), "term")
    val tf = m.groupBy(col("query_id"), col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dfr = m.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val dlr = col("dl").cast("double") /
      (col("sdl").cast("double") / col("nd").cast("double"))
    val tfn = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * dlr))
    val idf = log(lit(1.0) +
      (col("nd").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    // dl is corpus-sized: hint it away from broadcast (the q97-q99
    // lesson — a size misestimate must not broadcast a scale side)
    val sc = tf.join(broadcast(dfr), "term")
      .join(dl.hint("shuffle_merge"), "doc_id")
      .crossJoin(broadcast(st))
      .select(col("query_id"), col("doc_id"),
        round((idf * tfn) * lit(1000000)).cast("long").as("s"))
    val ag = sc.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("s")).as("score_unats"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_unats").desc, col("doc_id"))
    ag.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id").cast("long").as("query_id"), col("doc_id"),
        col("n_terms"), col("score_unats"), col("rank"))
  }

  /** DSIR scored frame over any documents-shaped frame (needs
    * `doc_id`, `source`, `text`): every doc with its importance
    * weight (micro-nats) and Gumbel-perturbed sampling key — the gate
    * query applies the global top-K on top. */
  private[graft] def dsirScores(d: DataFrame): DataFrame = {
    val bk = d.select(col("doc_id"),
      (col("source") === DsirTarget).as("is_t"),
      explode(NGrams.wordNGramsAll(Text.tokens(col("text")), 2)).as("g"))
      .select(col("doc_id"), col("is_t"),
        (shiftrightunsigned(SplitMix64.strHash(col("g")), 11)
          % DsirBuckets).as("b"))
    val bc = bk.groupBy(col("b")).agg(count(lit(1)).as("ca"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    val tot = bk.agg(count(lit(1)).as("ta"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("tt"))
    val lam = bc.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log(
          ((col("ct").cast("double") + lit(1.0)) /
            (col("tt").cast("double") + lit(1024.0))) /
            ((col("ca").cast("double") + lit(1.0)) /
              (col("ta").cast("double") + lit(1024.0)))) * lit(1000000))
          .cast("long").as("s"))
    val dw = bk.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
      .join(broadcast(lam), "b")
      .groupBy(col("doc_id")).agg(sum(col("n") * col("s")).as("w"))
    val u = SplitMix64.uniform(col("doc_id"), SaltGumbel)
    val gum = round(-log(-log(greatest(u, lit(1e-12)))) * lit(1000000))
      .cast("long")
    d.select(col("doc_id"), gum.as("gm"))
      .join(dw.hint("shuffle_merge"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("w"), lit(0L)).as("wsum_unats"),
        (coalesce(col("w"), lit(0L)) + col("gm")).as("key_unats"))
  }

  /** Bigram-LM mean surprisal over any documents-shaped frame (needs
    * `doc_id`, `text`). */
  private[graft] def bigramSurprisal(d: DataFrame): DataFrame = {
    val tk = d.select(col("doc_id"), Text.tokens(col("text")).as("t"))
    val toks = tk.select(explode(col("t")).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val vv = toks.agg(countDistinct(col("tok")).as("v"))
    val occ = tk.select(col("doc_id"),
      explode(NGrams.wordNGramsAll(col("t"), 2)).as("g"))
      .withColumn("w1", element_at(split(col("g"), " "), 1))
    val big = occ.groupBy(col("g")).agg(count(lit(1)).as("c12"))
    // both count tables grow with the vocabulary: hint them away
    // from broadcast
    val per = occ.join(big.hint("shuffle_merge"), "g")
      .join(uni.hint("shuffle_merge"), col("w1") === col("tok"))
      .crossJoin(broadcast(vv))
      .select(col("doc_id"),
        round(log((col("c1") + col("v")).cast("double") /
          (col("c12") + lit(1L)).cast("double")) * lit(1000000))
          .cast("long").as("s"))
    per.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("ssum"))
      .selectExpr("doc_id", "n_bigrams",
        "ssum div n_bigrams AS mean_surprisal_unats")
  }

  // ---- code-generated DuckDB oracles (shared constants) ------------

  private def oracle100: String = {
    val vals = Bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
    s"""WITH qt(query_id, term) AS (VALUES $vals),
       |dl AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS dl
       |  FROM documents),
       |st AS (SELECT sum(dl) AS sdl, count(*) AS nd FROM dl),
       |m AS (
       |  SELECT query_id, term, doc_id
       |  FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term
       |        FROM documents) tok
       |  JOIN qt USING (term)),
       |tf AS (
       |  SELECT query_id, term, doc_id, count(*) AS tf
       |  FROM m GROUP BY query_id, term, doc_id),
       |dfr AS (SELECT term, count(DISTINCT doc_id) AS df FROM m GROUP BY term),
       |sc AS (
       |  SELECT query_id, doc_id,
       |    CAST(round((ln(1.0 + (CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |        / (CAST(df AS DOUBLE) + 0.5))
       |      * ((CAST(tf AS DOUBLE) * 2.2)
       |        / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
       |          * (CAST(dl AS DOUBLE)
       |            / (CAST(sdl AS DOUBLE) / CAST(nd AS DOUBLE)))))))
       |      * 1000000) AS BIGINT) AS s
       |  FROM tf JOIN dfr USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
       |ag AS (
       |  SELECT query_id, doc_id, count(*) AS n_terms, sum(s) AS score
       |  FROM sc GROUP BY query_id, doc_id)
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |  CAST(n_terms AS BIGINT) AS n_terms,
       |  CAST(score AS BIGINT) AS score_unats, CAST(rank AS BIGINT) AS rank
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id) AS rank
       |  FROM ag)
       |WHERE rank <= $Bm25TopK""".stripMargin
  }

  private def oracle101: String = {
    val ph = SplitMix64.polyHashSql("g")
    val mx = SplitMix64.mixSql("p")
    val uu = SplitMix64.uniformSql("d.doc_id", SaltGumbel)
    s"""WITH tok AS (
       |  SELECT doc_id, source = '$DsirTarget' AS is_t,
       |    string_split_regex(text, '\\s+') AS t
       |  FROM documents),
       |gi AS (
       |  SELECT doc_id, is_t, t,
       |    unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
       |  FROM tok),
       |occ AS (SELECT doc_id, is_t, t[i] || ' ' || t[i+1] AS g FROM gi),
       |ph AS (SELECT doc_id, is_t, $ph AS p FROM occ),
       |bk AS (SELECT doc_id, is_t, (($mx) >> 11) % $DsirBuckets AS b FROM ph),
       |bc AS (
       |  SELECT b, count(*) AS ca,
       |    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
       |  FROM bk GROUP BY b),
       |tot AS (
       |  SELECT count(*) AS ta, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tt
       |  FROM bk),
       |lam AS (
       |  SELECT b,
       |    CAST(round(ln(((CAST(ct AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + 1024.0))
       |      / ((CAST(ca AS DOUBLE) + 1.0) / (CAST(ta AS DOUBLE) + 1024.0)))
       |      * 1000000) AS BIGINT) AS s
       |  FROM bc, tot),
       |db AS (SELECT doc_id, b, count(*) AS n FROM bk GROUP BY doc_id, b),
       |dw AS (
       |  SELECT doc_id, sum(n * s) AS w
       |  FROM db JOIN lam USING (b) GROUP BY doc_id),
       |scored AS (
       |  SELECT d.doc_id, coalesce(w, 0) AS wsum,
       |    coalesce(w, 0) + CAST(round(-ln(-ln(greatest($uu, 1e-12)))
       |      * 1000000) AS BIGINT) AS ky
       |  FROM documents d LEFT JOIN dw ON d.doc_id = dw.doc_id)
       |SELECT doc_id, CAST(wsum AS BIGINT) AS wsum_unats,
       |  CAST(ky AS BIGINT) AS key_unats, CAST(rank AS BIGINT) AS rank
       |FROM (
       |  SELECT *, row_number() OVER (ORDER BY ky DESC, doc_id) AS rank
       |  FROM scored)
       |WHERE rank <= $DsirTopK""".stripMargin
  }

  private val oracle103: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
      |un AS (SELECT doc_id, unnest(t) AS tok FROM tok),
      |uni AS (SELECT tok, count(*) AS c1 FROM un GROUP BY tok),
      |vv AS (SELECT count(DISTINCT tok) AS v FROM un),
      |gi AS (
      |  SELECT doc_id, t,
      |    unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
      |  FROM tok),
      |occ AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS g FROM gi),
      |big AS (SELECT g, count(*) AS c12 FROM occ GROUP BY g),
      |per AS (
      |  SELECT doc_id,
      |    CAST(round(ln(CAST(c1 + v AS DOUBLE) / CAST(c12 + 1 AS DOUBLE))
      |      * 1000000) AS BIGINT) AS s
      |  FROM occ JOIN big USING (g) JOIN uni ON occ.w1 = uni.tok CROSS JOIN vv)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(s) AS BIGINT) // count(*) AS mean_surprisal_unats
      |FROM per GROUP BY doc_id""".stripMargin

  /** The q103 per-doc surprisal chain (tok..du CTE bodies) over `src`
    * — shared by oracle120/oracle123 and the composed-pipeline
    * head-keep fragment, so every consumer replays the exact same
    * model. `du` = (doc_id, su) mean surprisal in micro-nats. */
  private def surprisalChainSql(src: String): String =
    s"""tok AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM $src),
       |un AS (SELECT doc_id, unnest(t) AS tok FROM tok),
       |uni AS (SELECT tok, count(*) AS c1 FROM un GROUP BY tok),
       |vv AS (SELECT count(DISTINCT tok) AS v FROM un),
       |gi AS (
       |  SELECT doc_id, t,
       |    unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
       |  FROM tok),
       |occ AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS g FROM gi),
       |big AS (SELECT g, count(*) AS c12 FROM occ GROUP BY g),
       |per AS (
       |  SELECT doc_id,
       |    CAST(round(ln(CAST(c1 + v AS DOUBLE) / CAST(c12 + 1 AS DOUBLE))
       |      * 1000000) AS BIGINT) AS s
       |  FROM occ JOIN big USING (g) JOIN uni ON occ.w1 = uni.tok CROSS JOIN vv),
       |du AS (
       |  SELECT doc_id, CAST(sum(s) AS BIGINT) // count(*) AS su
       |  FROM per GROUP BY doc_id)""".stripMargin

  /** The q123 tercile head-keep doc_ids over `src` — the composed
    * q143 oracle chains the CCNet head filter from it (only the t1
    * threshold is needed: 'head' is everything at or below it). */
  private[operators] def headKeepIdsSql(src: String): String =
    s"""WITH ${surprisalChainSql(src)},
       |bins AS (SELECT su // $PplBinUnats AS b, count(*) AS nb FROM du GROUP BY 1),
       |cw AS (
       |  SELECT b, sum(nb) OVER (ORDER BY b) AS cum, sum(nb) OVER () AS tot
       |  FROM bins),
       |thr AS (
       |  SELECT min(CASE WHEN cum >= (tot + 2) // 3 THEN b END) AS t1
       |  FROM cw)
       |SELECT doc_id FROM du, thr WHERE su // $PplBinUnats <= t1""".stripMargin

  /** q120: the q103 per-doc chain + source aggregation; the global
    * mean comes from the per-source sums, exactly as in the engine. */
  private val oracle120: String =
    s"""WITH ${surprisalChainSql("documents")},
       |bysrc AS (
       |  SELECT d.source, count(*) AS n_docs, sum(su) AS ssum
       |  FROM documents d JOIN du USING (doc_id) GROUP BY d.source),
       |fin AS (
       |  SELECT source, n_docs, ssum // n_docs AS mean_unats,
       |    sum(ssum) OVER () // sum(n_docs) OVER () AS gm
       |  FROM bysrc),
       |fw AS (
       |  SELECT source, n_docs, mean_unats,
       |    greatest(mean_unats - gm, 0) AS excess_unats,
       |    greatest(mean_unats - gm, 0) + $ReweightBase AS wraw
       |  FROM fin)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(mean_unats AS BIGINT) AS mean_unats,
       |  CAST(excess_unats AS BIGINT) AS excess_unats,
       |  CAST(wraw * 1000000 // sum(wraw) OVER () AS BIGINT) AS weight_ppm
       |FROM fw""".stripMargin

  /** q123: the q103 per-doc chain + binned tercile thresholds. */
  private val oracle123: String =
    s"""WITH ${surprisalChainSql("documents")},
       |bins AS (SELECT su // $PplBinUnats AS b, count(*) AS nb FROM du GROUP BY 1),
       |cw AS (
       |  SELECT b, sum(nb) OVER (ORDER BY b) AS cum, sum(nb) OVER () AS tot
       |  FROM bins),
       |thr AS (
       |  SELECT min(CASE WHEN cum >= (tot + 2) // 3 THEN b END) AS t1,
       |    min(CASE WHEN cum >= (2 * tot + 2) // 3 THEN b END) AS t2
       |  FROM cw)
       |SELECT doc_id, CAST(su AS BIGINT) AS mean_surprisal_unats,
       |  CASE WHEN su // $PplBinUnats <= t1 THEN 'head'
       |    WHEN su // $PplBinUnats <= t2 THEN 'middle'
       |    ELSE 'tail' END AS ppl_bucket
       |FROM du, thr""".stripMargin

  val oracles: Map[String, String] = Map(
    "q100_bm25_topk" -> oracle100,
    "q101_dsir_resample" -> oracle101,
    "q103_bigram_lm" -> oracle103,
    "q120_domain_reweight" -> oracle120,
    "q123_perplexity_buckets" -> oracle123,
  )
}
