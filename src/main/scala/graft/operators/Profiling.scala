package graft.operators

import graft.Tables
import graft.functions.SplitMix64
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data profiling: per-column quality metrics in ONE pass over the
  * table (counts, null counts, distincts, ranges) — the standard
  * pre-ingestion audit for a training corpus. Stacked as one row per
  * column so adding columns never changes the schema.
  *
  * q140 adds the dataset MANIFEST: an order-invariant per-source
  * content fingerprint (the Merkle-audit idea of Iceberg/Delta
  * manifests, flattened to commutative aggregates so it distributes
  * with zero coordination) — at 100 TB this is how two runs, or two
  * clusters, prove they trained on byte-identical corpora without
  * ever co-locating the data: every aggregate (count, byte sum,
  * id range, XOR and modular sum of per-row splitmix64 hashes) is
  * commutative + associative, so the result is independent of
  * partitioning, row order, and executor count by construction. */
object Profiling {
  type Q = (SparkSession, String) => DataFrame

  /** q140: modulus for the additive fingerprint (2^53 — the hash's
    * comparable-top-bits domain, see [[graft.functions.StrHash]]). */
  private[graft] val FpMod = 9007199254740992L

  val queries: Map[String, Q] = Map(
    // -- q140: per-source dataset manifest. XOR alone is blind to
    //    even-multiplicity duplicates, the modular SUM alone to id
    //    swaps; together (plus count/bytes/range) a single changed,
    //    dropped, or duplicated row flips the manifest. The row hash
    //    keys on (doc_id, text) so the same text under a different id
    //    still registers. ONE map-side-combined keyed groupBy to a
    //    ≤|sources|-row output; no joins, no windows. --
    "q140_source_manifest" -> { (s, dir) =>
      manifest(Tables.load(s, dir, "documents"))
    },
    "q74_profile" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      def prof(colName: String, valueExpr: org.apache.spark.sql.Column) = struct(
        lit(colName).as("col_name"),
        count(lit(1)).as("n_rows"),
        sum(when(valueExpr.isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(valueExpr).as("n_distinct"),
        min(valueExpr.cast("string")).as("min_str"),
        max(valueExpr.cast("string")).as("max_str"))
      o.agg(
        prof("o_orderstatus", col("o_orderstatus")).as("a"),
        prof("o_orderpriority", col("o_orderpriority")).as("b"),
        prof("o_custkey", col("o_custkey")).as("c"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("p"))
        .select("p.col_name", "p.n_rows", "p.n_null", "p.n_distinct",
          "p.min_str", "p.max_str")
    },
  )

  /** q140 over any (source, doc_id, text) frame — exposed for the
    * spec's permutation-invariance and sensitivity proofs. hu is the
    * hash's top 53 bits (`>>> 11`) — the non-negative cross-engine
    * domain, so XOR stays sign-free and the modular sum's DECIMAL
    * partials (≤ 2^53 per row) never overflow DECIMAL(38,0) below
    * ~10^22 rows. */
  private[graft] def manifest(d: DataFrame): DataFrame =
    d.select(col("source"), col("doc_id"),
        // NULL text counts as empty on BOTH engines: concat_ws would drop
        // the separator too (key "7" vs the oracle's "7:"), and
        // octet_length(NULL) would silently skip the row's bytes.
        octet_length(coalesce(col("text"), lit(""))).cast("long").as("nb"),
        shiftrightunsigned(SplitMix64.strHash(
          concat(col("doc_id").cast("string"), lit(":"),
            coalesce(col("text"), lit("")))), 11)
          .as("hu"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nb")).as("n_bytes"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        expr("bit_xor(hu)").as("fp_xor"),
        sum(col("hu").cast("decimal(38,0)")).as("sh"))
      .selectExpr("source", "n_docs", "n_bytes", "min_doc", "max_doc",
        "fp_xor", s"CAST(sh % $FpMod AS BIGINT) AS fp_sum")
      .orderBy(col("source"))

  private def oracle140: String =
    s"""WITH k AS (
       |  SELECT source, doc_id, strlen(coalesce(text, '')) AS nb,
       |    concat(CAST(doc_id AS VARCHAR), ':', coalesce(text, '')) AS key
       |  FROM documents),
       |ph AS (SELECT source, doc_id, nb, ${SplitMix64.polyHashSql("key")} AS p
       |  FROM k),
       |h AS (SELECT source, doc_id, nb,
       |    CAST((${SplitMix64.mixSql("p")}) >> 11 AS BIGINT) AS hu
       |  FROM ph)
       |SELECT source, count(*) AS n_docs, CAST(sum(nb) AS BIGINT) AS n_bytes,
       |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
       |  CAST(bit_xor(hu) AS BIGINT) AS fp_xor,
       |  CAST(sum(CAST(hu AS HUGEINT)) % $FpMod AS BIGINT) AS fp_sum
       |FROM h GROUP BY source ORDER BY source""".stripMargin

  val oracles: Map[String, String] = Map(
    "q140_source_manifest" -> oracle140,
    "q74_profile" ->
      """SELECT 'o_orderstatus' AS col_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT o_orderstatus) AS n_distinct,
        |  min(CAST(o_orderstatus AS VARCHAR)) AS min_str,
        |  max(CAST(o_orderstatus AS VARCHAR)) AS max_str
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderpriority),
        |  min(CAST(o_orderpriority AS VARCHAR)), max(CAST(o_orderpriority AS VARCHAR))
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*),
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_custkey),
        |  min(CAST(o_custkey AS VARCHAR)), max(CAST(o_custkey AS VARCHAR))
        |FROM orders""".stripMargin,
  )
}
