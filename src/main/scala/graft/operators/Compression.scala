package graft.operators

import graft.Tables
import graft.functions.{NormSignProject, SignProjectKernel}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss embedding compression (Achlioptas 2001,
  * database-friendly ±1 projections) — the storage/compute reduction
  * a 100 TB similarity pipeline applies before indexing: 64 float
  * dims → [[KDims]] integer dims, after which every distance
  * computation is pure integer arithmetic (4× fewer dims AND exact
  * cross-engine replay, vs the float-cosine queries whose oracles
  * need round-6 quantization). The reference's analysis layer
  * (/root/reference/src/cosmap/analysis/runner.py) has per-sample
  * scoring only — this extends the engine per the brief's
  * training-data mandate, like Dedup/Similarity/Curation.
  *
  *  - q106 top-5 neighbor retrieval in the COMPRESSED space for a
  *    fixed query panel: embeddings are micro-quantized
  *    (round(x·1e6), the q100 proven-exact rounding), sign-projected
  *    through the codegen [[SignProjectExpr]] (one k×d integer loop
  *    per row — the house custom-Expression rule, not nested HOFs),
  *    and ranked by integer dot product.
  *
  * Cross-engine exactness: quantization is the one shared round();
  * everything after — the ±1 projection, the 16-term dot, the
  * ordering — is integer arithmetic, bit-stable on any engine,
  * partitioning, or summation order. The oracle re-derives the
  * projection from the SAME [[SignProjectKernel.masks]] constants as
  * generated ±q_i column sums (the q83 shared-constant playbook).
  *
  * Scale shape: projection is map-side inside the scan stage; the
  * query panel is a FIXED-size broadcast dim (4 rows — never grows
  * with the corpus); candidate scoring is map-side; the only shuffle
  * is the q_id-window top-5 (the established q94 shape). The panel
  * being fixed is the declared-baseline trade — a query set that
  * grows with the corpus takes the q94b cell-join path instead, where
  * this same compression drops in as the candidate-scoring metric.
  */
object Compression {
  type Q = (SparkSession, String) => DataFrame

  private[graft] val KDims = 16
  private[graft] val Salt = 106L
  private[graft] val TopK = 5
  private[graft] val QueryIds = Seq(0L, 5L, 11L, 17L)

  /** The shared engine/oracle constant: k sign rows packed as 64-bit
    * masks, derived from splitmix64 — see [[SignProjectKernel.masks]]. */
  private[graft] lazy val Masks: Array[Long] = SignProjectKernel.masks(KDims, Salt)

  /** (vec_id, proj) — the compressed corpus. Embeddings are unit-
    * normalized BEFORE quantization (so the integer dot tracks
    * cosine, not the norm-skewed raw dot), then micro-quantized.
    * Exactness: the squared-norm sum is a GENERATED fixed-order
    * left-assoc 64-term sum (same parenthesization in the oracle);
    * sqrt and the division are IEEE-correctly-rounded in both engines
    * (the house transcendental exception); ×1e6 and round(half-away)
    * are the q100 proven contract. */
  private[graft] def projected(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      NormSignProject(col("embedding"), Masks).as("proj"))

  /** Expanded integer dot over the k compressed dims (codegen-
    * friendly column arithmetic, no per-row lambda). */
  private[graft] def dotK(a: Column, b: Column): Column =
    (0 until KDims).map(i =>
      element_at(a, i + 1) * element_at(b, i + 1)).reduce(_ + _)

  val queries: Map[String, Q] = Map(
    // -- top-5 per panel query by compressed integer dot product;
    //    ties broken by vec_id; self-matches excluded. --
    "q106_jl_topk" -> { (s, dir) =>
      val p = projected(Tables.load(s, dir, "embeddings"))
      val qp = p.filter(col("vec_id").isin(QueryIds: _*))
        .select(col("vec_id").as("q_id"), col("proj").as("qproj"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("dot_c").desc, col("vec_id"))
      p.crossJoin(broadcast(qp))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          dotK(col("proj"), col("qproj")).as("dot_c"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TopK)
    },
  )

  // ---- code-generated DuckDB oracle (same mask constants) ----------

  /** `(+q1 -q2 ... ±q64)` for output dim j, from the shared masks. */
  private def projSql(j: Int): String =
    (0 until 64).map { i =>
      (if (SignProjectKernel.sign(Masks, j, i) > 0) "+" else "-") + s"q${i + 1}"
    }.mkString("(", "", ")")

  private def oracle106: String = {
    val nrm = "sqrt(" + (1 to 64).map(i =>
      s"CAST(embedding[$i] AS DOUBLE) * CAST(embedding[$i] AS DOUBLE)")
      .mkString(" + ") + ")"
    val qCols = (1 to 64).map(i =>
      s"CAST(round(CAST(embedding[$i] AS DOUBLE) / nrm * 1000000.0) AS BIGINT) AS q$i")
      .mkString(", ")
    val pCols = (0 until KDims).map(j => s"${projSql(j)} AS p$j").mkString(", ")
    val dot = (0 until KDims).map(j => s"q.p$j * c.p$j").mkString(" + ")
    s"""WITH nn AS (SELECT vec_id, embedding, $nrm AS nrm FROM embeddings),
       |qz AS (SELECT vec_id, $qCols FROM nn),
       |pj AS (SELECT vec_id, $pCols FROM qz),
       |sc AS (
       |  SELECT q.vec_id AS q_id, c.vec_id, ($dot) AS dot_c
       |  FROM pj q JOIN pj c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id IN (${QueryIds.mkString(", ")}))
       |SELECT q_id, vec_id, dot_c, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY dot_c DESC, vec_id) AS rank
       |  FROM sc)
       |WHERE rank <= $TopK""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q106_jl_topk" -> oracle106,
  )
}
