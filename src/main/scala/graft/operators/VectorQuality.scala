package graft.operators

import graft.Tables
import graft.functions.VectorExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q196 — the q193 planted-cluster quality benchmark for the VECTOR
  * families: how well does each embedding-dedup stack (candidates →
  * exact-cosine verify → CC clustering) recover planted duplicate
  * clusters?
  *
  *  1. Planted corpus: every 5th embeddings row spawns a 4-variant
  *     cluster (vid = vec_id·4 + j). Variant j keeps the first
  *     64 − 4·j coordinates and ZEROES the tail — float-exact on both
  *     engines (zeros and copies introduce no rounding), and with
  *     nested zero-tails the intra-cluster cosine has the closed form
  *     cos(v_a, v_b) = sqrt(S_b / S_a) (S_m = Σ of the first 64 − 4m
  *     coordinates squared). Probed on this corpus (VectorMarginProbe):
  *     planted cosines span [0.743, 0.9995] while the maximum ORGANIC
  *     cross-base cosine is 0.562 at every scale — the 0.70 operating
  *     threshold sits in a ≥ 0.14-wide empty gap on BOTH sides, so
  *     the brute family's perfect recovery is a property of the real
  *     corpus, not just a toy (VectorQualitySpec pins it).
  *  2. Families, each its audited machinery: `brute` — the q48-style
  *     all-pairs exact verify (the declared oracle baseline);
  *     `signlsh` — the q87 adaptive sign-LSH candidates + verify (the
  *     scale path); `cell` — SemDeDup-style same-cell-only candidates
  *     over the adaptive Centroids94 prefix + verify (the q102
  *     restriction, whose cross-cell misses this benchmark measures).
  *  3. The q193 census: pair precision/recall of recovered vs planted
  *     clusters from size tables only.
  *
  * Cross-engine exactness notes (the house contract): cosines are the
  * same left-to-right double accumulation on both engines (round-6 at
  * the threshold); the sign-LSH band keys and the cell argmax are
  * stable because the VARIANT corpus's margins are probed and
  * spec-pinned like the base corpus's (VectorQualitySpec /
  * graft.tools.CalibProbe — a zeroed tail changes every dot, so the
  * base-corpus margin assertions do not transfer automatically). */
object VectorQuality {
  type Q = (SparkSession, String) => DataFrame

  private[graft] val VBaseMod = 5L
  private[graft] val VariantsPerBase = 4
  /** Coordinates zeroed per variant step; variant j zeroes 4·j of 64. */
  private[graft] val ZeroStep = 4
  /** The operating cosine threshold (round-6, the house rule) — set
    * inside the measured [0.562, 0.743] planted/organic gap. */
  private[graft] val CosThreshold = 0.70

  /** The planted vector corpus: (vec_id = base·4 + j, embedding). */
  private[graft] def plantedVecVariants(e: DataFrame): DataFrame = {
    val base = e.filter(col("vec_id") % VBaseMod === 0)
    base.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0L), lit(VariantsPerBase - 1L))).as("j"))
      .select((col("vec_id") * VariantsPerBase + col("j")).as("vec_id"),
        when(col("j") === 0, col("embedding")).otherwise(
          concat(
            slice(col("embedding"), lit(1),
              (lit(64L) - col("j") * ZeroStep).cast("int")),
            array_repeat(lit(0.0f), (col("j") * ZeroStep).cast("int"))))
          .as("embedding"))
  }

  /** All-pairs exact-cosine pairs at the threshold (the q48 shape —
    * the declared baseline the approximate families are scored
    * against; both sides of the self-join shuffle). */
  private def brutePairs(v: DataFrame): DataFrame = {
    val ea = v.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val eb = v.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    ea.hint("shuffle_merge")
      .join(eb.hint("shuffle_merge"), col("vec_a") < col("vec_b"))
      .filter(round(VectorExprs.cosineFast(col("emb_a"), col("emb_b")), 6)
        >= CosThreshold)
      .select(col("vec_a"), col("vec_b"))
  }

  /** SemDeDup-style same-cell candidates (adaptive Centroids94
    * prefix) + exact verify — the q102 restriction as a pair family:
    * pairs straddling a cell boundary are structurally unreachable,
    * which is exactly the recall deficit this benchmark measures. */
  private def cellPairs(v: DataFrame): DataFrame = {
    val cents = Centroids94.table.take(Similarity.adaptiveCells(v.count()))
    val sims = array(cents.map(c =>
      VectorExprs.cosineFast(col("embedding"), typedlit(c))): _*)
    val assigned = v.select(col("vec_id"), col("embedding"),
      (array_position(sims, array_max(sims)) - 1).cast("int").as("cell"))
    assigned.as("a").hint("shuffle_merge")
      .join(assigned.as("b").hint("shuffle_merge"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(VectorExprs.cosineFast(col("a.embedding"),
        col("b.embedding")), 6) >= CosThreshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
  }

  /** One family's quality row — the q193 census over vector labels. */
  private def familyRow(family: String, corpus: DataFrame,
      pairs: DataFrame): DataFrame = {
    val labels = graft.dedup.ConnectedComponents.clusterLabels(
      pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
    val lab = corpus.select(col("vec_id").as("doc_id"))
      .join(labels.hint("shuffle_merge"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cid"),
        // integer floor division, mirroring the oracle's `//` exactly
        expr(s"doc_id div $VariantsPerBase").as("pid"))
    def pairSum(g: DataFrame): DataFrame =
      g.agg(coalesce(sum(expr("m * (m - 1) div 2")), lit(0L)).as("p"))
    val nd = lab.agg(count(lit(1)).as("n_docs"))
    val planted = pairSum(lab.groupBy(col("pid")).agg(count(lit(1)).as("m")))
    val recovered = pairSum(lab.groupBy(col("cid")).agg(count(lit(1)).as("m")))
    val correct = pairSum(lab.groupBy(col("cid"), col("pid"))
      .agg(count(lit(1)).as("m")))
    nd.crossJoin(planted.select(col("p").as("planted_pairs")))
      .crossJoin(recovered.select(col("p").as("recovered_pairs")))
      .crossJoin(correct.select(col("p").as("correct_pairs")))
      .select(lit(family).as("family"), col("n_docs"),
        col("planted_pairs"), col("recovered_pairs"), col("correct_pairs"),
        expr("(1000000L * correct_pairs) div greatest(recovered_pairs, 1L)")
          .as("precision_ppm"),
        expr("(1000000L * correct_pairs) div greatest(planted_pairs, 1L)")
          .as("recall_ppm"))
  }

  /** Top-2 cell assignment (q199): c1 = the argmax cell (identical to
    * [[cellPairs]]' assignment), c2 = the argmax over the sims array
    * with c1's slot masked to −2 (below any cosine) — the first
    * occurrence of the SECOND-highest cell cosine. Tie semantics
    * replay exactly relationally: ranking (sim DESC, index ASC) per
    * vector yields c1 at rank 1 and c2 at rank 2, including duplicate
    * cosine values (first occurrence wins on both engines), so the
    * oracle needs NO new float margin — only the bit-identical
    * cosines the q196 family already relies on. Map-side, no explode:
    * the assignment stays one projection at 100 TB. */
  private[graft] def assignTop2(v: DataFrame,
      cents: Seq[Seq[Double]]): DataFrame = {
    val sims = array(cents.map(c =>
      VectorExprs.cosineFast(col("embedding"), typedlit(c))): _*)
    v.select(col("vec_id"), sims.as("s"))
      .withColumn("c1",
        (array_position(col("s"), array_max(col("s"))) - 1).cast("int"))
      .withColumn("m", transform(col("s"),
        (x, i) => when(i === col("c1"), lit(-2.0d)).otherwise(x)))
      .withColumn("c2",
        (array_position(col("m"), array_max(col("m"))) - 1).cast("int"))
      .select(col("vec_id"), col("c1"), col("c2"))
  }

  /** Distinct candidate pairs sharing any cell of a (vec_id, cell)
    * frame — cell-keyed equi-join, the q102 family's scale shape.
    * Exposed (with [[top2Exploded]]) for ScaleProbe's r14 section. */
  private[graft] def cellCands(t: DataFrame): DataFrame =
    t.as("a").hint("shuffle_merge")
      .join(t.as("b").hint("shuffle_merge"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()

  /** The ×2 fan-out frame: one row per (vector, top-2 cell). */
  private[graft] def top2Exploded(assigned: DataFrame): DataFrame =
    assigned.select(col("vec_id"),
      explode(array(col("c1"), col("c2"))).as("cell"))

  /** q199: the SemDeDup recall LEVER — q196 measured the same-cell
    * restriction's cluster-pair recall at 651k ppm (sf0.1); this is
    * the fix it exposed, priced by the same benchmark: multi-probe
    * cell restriction (compare vectors sharing ANY of their top-2
    * assigned cells — the q94 probe idea applied to dedup) as a
    * family row beside the single-cell baseline, each with its
    * measured CANDIDATE volume. A planted pair straddling one cell
    * boundary is reachable through either endpoint's second cell, so
    * recall must sit at-or-above the single-cell row at a bounded
    * candidate increase (per-vector fan-out ×2 ⇒ ≤ 4× pair bound;
    * measured well under — ScaleProbe r14 runs the generator under
    * the signed-permutation null model). Scale shape: the assignment
    * is one map pass; candidates ride cell-keyed equi-joins exactly
    * like the q102 family; censuses are the q193 size-table reads. */
  private[graft] def top2QualityTable(e: DataFrame): DataFrame = {
    val corpus = plantedVecVariants(e).localCheckpoint(true)
    val cents = Centroids94.table.take(
      Similarity.adaptiveCells(corpus.count()))
    val assigned = assignTop2(corpus, cents).localCheckpoint(true)
    val c1 = cellCands(assigned.select(col("vec_id"),
      col("c1").as("cell"))).localCheckpoint(true)
    val c2 = cellCands(top2Exploded(assigned)).localCheckpoint(true)
    val ea = corpus.select(col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val eb = corpus.select(col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    def verified(cand: DataFrame): DataFrame =
      cand.join(ea, "vec_a").join(eb, "vec_b")
        .filter(round(VectorExprs.cosineFast(col("emb_a"), col("emb_b")), 6)
          >= CosThreshold)
        .select(col("vec_a"), col("vec_b"))
    def rowWith(family: String, cand: DataFrame): DataFrame =
      familyRow(family, corpus, verified(cand))
        .crossJoin(cand.agg(count(lit(1)).as("candidates")))
    rowWith("cell", c1).unionByName(rowWith("cell_p2", c2))
  }

  /** The three-family quality table — exposed for VectorQualitySpec. */
  private[graft] def vectorQualityTable(e: DataFrame): DataFrame = {
    val corpus = plantedVecVariants(e).localCheckpoint(true)
    val brute = brutePairs(corpus)
    val sign = Similarity.adaptiveEdges(
      corpus.select(col("vec_id"), col("embedding")), CosThreshold)
    val cell = cellPairs(corpus)
    familyRow("brute", corpus, brute)
      .unionByName(familyRow("signlsh", corpus, sign))
      .unionByName(familyRow("cell", corpus, cell))
  }

  val queries: Map[String, Q] = Map(
    // -- q196 (round 13): the planted-cluster quality benchmark for
    //    the vector families — brute / adaptive sign-LSH / same-cell
    //    (SemDeDup restriction), each through exact verify + CC,
    //    scored as pair precision/recall vs the planted clusters. --
    "q196_vector_quality" -> { (s, dir) =>
      vectorQualityTable(Tables.load(s, dir, "embeddings"))
    },

    // -- q199 (round 14): multi-probe SemDeDup — the recall lever for
    //    the q196-measured same-cell deficit: vectors compare within
    //    ANY of their top-2 assigned cells. Two family rows (cell /
    //    cell_p2), each with measured candidate volume + the planted
    //    cluster census — the benchmark prices the fix it exposed.
    //    EXACT-gated: the oracle replays the corpus, the rank-derived
    //    top-2 assignment, both candidate joins, verifies, CC walks
    //    and censuses. --
    "q199_semdedup_probe2" -> { (s, dir) =>
      top2QualityTable(Tables.load(s, dir, "embeddings"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q196_vector_quality" -> oracle196,
    "q199_semdedup_probe2" -> oracle199,
  )

  // ---- generated oracle ---------------------------------------------

  private def cosE(a: String, b: String): String = {
    def dotE = s"list_sum(list_transform(list_zip($a, $b), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    def sumsq(v: String) =
      s"list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    s"($dotE / (sqrt(${sumsq(a)}) * sqrt(${sumsq(b)})))"
  }

  /** oracle196: the variant corpus (list slice + a zero tail —
    * float-exact), the three family pair chains (brute = the all-pairs
    * verify; signlsh = the factored q87 chain nested as a scoped
    * subquery; cell = the adaptive-prefix argmax assignment + same-
    * cell verify), a prefixed recursive CC walk each (the q193
    * fragments reused), label completion and the shared census. */
  /** The variant-corpus CTEs (vbase → vdef → variants) shared by
    * oracle196 and oracle199. */
  private def vecVariantCtes: String =
    s"""vbase AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id % $VBaseMod = 0),
       |vdef AS (
       |  SELECT vec_id, embedding, j,
       |    vec_id * $VariantsPerBase + j AS vid, j * $ZeroStep AS m
       |  FROM vbase, (SELECT unnest(range($VariantsPerBase)) AS j) js),
       |variants AS MATERIALIZED (
       |  SELECT vid AS vec_id,
       |    CASE WHEN j = 0 THEN embedding
       |    ELSE list_concat(list_slice(embedding, 1, 64 - m),
       |      list_transform(generate_series(1, m), i -> CAST(0.0 AS FLOAT)))
       |    END AS embedding
       |  FROM vdef)""".stripMargin

  /** The full Centroids94 cosine list over `embedding` — sliced by
    * `[1:ncells]` at use sites (the adaptive-prefix replay). */
  private def simListSql: String = {
    def lst(c: Seq[Double]) = c.map(v => f"$v%.3f").mkString("[", ", ", "]")
    Centroids94.table
      .map(c => cosE("embedding", lst(c)))
      .mkString("[\n      ", ",\n      ", "]")
  }

  /** Label completion over the variant vectors (singletons = own
    * cluster + planted id) — shared by oracle196 and oracle199. */
  private def vecLabCte(p: String): String =
    s"""${p}lab AS MATERIALIZED (
       |  SELECT v.vec_id AS doc_id,
       |    coalesce(l.cluster_id, v.vec_id) AS cid,
       |    v.vec_id // $VariantsPerBase AS pid
       |  FROM variants v LEFT JOIN ${p}labels l ON v.vec_id = l.doc_id)"""
      .stripMargin

  private def oracle196: String = {
    def sub(q: String): String = q.linesIterator.mkString("\n  ")
    val simList = simListSql
    def labCte(p: String): String = vecLabCte(p)
    val rows = Seq("vb" -> "brute", "vs" -> "signlsh", "vc" -> "cell")
      .map { case (p, f) => DedupQuality.censusSql(p, f) }
    s"""WITH RECURSIVE $vecVariantCtes,
       |bpairs AS MATERIALIZED (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM variants a JOIN variants b ON a.vec_id < b.vec_id
       |  WHERE round(${cosE("a.embedding", "b.embedding")}, 6)
       |    >= $CosThreshold),
       |spairs AS MATERIALIZED (
       |  SELECT vec_a AS doc_a, vec_b AS doc_b FROM (
       |  ${sub(Similarity.adaptivePairsSqlOver("variants",
              CosThreshold.toString))})),
       |vcc AS (
       |  SELECT CASE WHEN count(*) <= 512 THEN 16
       |              WHEN count(*) <= 1024 THEN 32
       |              ELSE 64 END AS ncells
       |  FROM variants),
       |vassigned AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    CAST(list_position(lc, list_max(lc)) - 1 AS INTEGER) AS cell
       |  FROM (SELECT vec_id, embedding, ($simList)[1:ncells] AS lc
       |        FROM variants, vcc)),
       |cpairs AS MATERIALIZED (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM vassigned a JOIN vassigned b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE round(${cosE("a.embedding", "b.embedding")}, 6)
       |    >= $CosThreshold),
       |${DedupQuality.ccWalkCtes("vb", "bpairs")},
       |${DedupQuality.ccWalkCtes("vs", "spairs")},
       |${DedupQuality.ccWalkCtes("vc", "cpairs")},
       |${labCte("vb")},
       |${labCte("vs")},
       |${labCte("vc")},
       |rows AS (
       |${rows.mkString("\nUNION ALL\n")})
       |SELECT family, n_docs, planted_pairs, recovered_pairs,
       |  correct_pairs,
       |  (1000000 * correct_pairs) // greatest(recovered_pairs, 1)
       |    AS precision_ppm,
       |  (1000000 * correct_pairs) // greatest(planted_pairs, 1)
       |    AS recall_ppm
       |FROM rows""".stripMargin
  }

  /** oracle199: the variant corpus + adaptive cell count, the RANKED
    * cell assignment (per (vector, cell-index) rows ranked by
    * (cosine DESC, index ASC) — rank 1 IS the engine's argmax, ranks
    * ≤ 2 the top-2 set, tie-broken identically on both engines by
    * first occurrence), both candidate joins, the exact-cosine
    * verify, a CC walk + census per family, with each family's
    * candidate volume attached (the q197 row shape). */
  private def oracle199: String = {
    val rows = Seq(("p1", "cell", "p1cand"), ("p2", "cell_p2", "p2cand"))
      .map { case (p, fam, cand) =>
        s"""SELECT (SELECT CAST(count(*) AS BIGINT) FROM $cand)
           |    AS candidates, c.*
           |FROM (
           |${DedupQuality.censusSql(p, fam)}) c""".stripMargin
      }
    def pairsCte(p: String): String =
      s"""${p}pairs AS MATERIALIZED (
         |  SELECT doc_a, doc_b FROM ${p}cand
         |  JOIN variants va ON va.vec_id = doc_a
         |  JOIN variants vb ON vb.vec_id = doc_b
         |  WHERE round(${cosE("va.embedding", "vb.embedding")}, 6)
         |    >= $CosThreshold)""".stripMargin
    s"""WITH RECURSIVE $vecVariantCtes,
       |vcc AS (
       |  SELECT CASE WHEN count(*) <= 512 THEN 16
       |              WHEN count(*) <= 1024 THEN 32
       |              ELSE 64 END AS ncells
       |  FROM variants),
       |vsim AS (
       |  SELECT vec_id, ($simListSql)[1:ncells] AS lc
       |  FROM variants, vcc),
       |vrows AS (
       |  SELECT vec_id, lc, unnest(generate_series(1, len(lc))) AS i
       |  FROM vsim),
       |vranked AS MATERIALIZED (
       |  SELECT vec_id, i - 1 AS cell,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY lc[i] DESC, i ASC) AS rn
       |  FROM vrows),
       |vt1 AS (SELECT vec_id, cell FROM vranked WHERE rn = 1),
       |vt2 AS (SELECT DISTINCT vec_id, cell FROM vranked WHERE rn <= 2),
       |p1cand AS MATERIALIZED (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM vt1 a JOIN vt1 b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |p2cand AS MATERIALIZED (
       |  SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM vt2 a JOIN vt2 b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |${pairsCte("p1")},
       |${pairsCte("p2")},
       |${DedupQuality.ccWalkCtes("p1", "p1pairs")},
       |${DedupQuality.ccWalkCtes("p2", "p2pairs")},
       |${vecLabCte("p1")},
       |${vecLabCte("p2")},
       |rows AS (
       |${rows.mkString("\nUNION ALL\n")})
       |SELECT family, candidates, n_docs, planted_pairs, recovered_pairs,
       |  correct_pairs,
       |  (1000000 * correct_pairs) // greatest(recovered_pairs, 1)
       |    AS precision_ppm,
       |  (1000000 * correct_pairs) // greatest(planted_pairs, 1)
       |    AS recall_ppm
       |FROM rows""".stripMargin
  }
}
