package graft.operators

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal pipeline exposed as driver-gate queries.
  *
  * The feature vector (16-bin byte histogram from the stub codec,
  * graft.multimodal.Multimodal) is emitted EXPLODED to one row per
  * bin with the share as a parts-per-million integer:
  *  - raw `array<double>` output crashed the driver's pandas-side
  *    oracle harness (unsortable ndarray column) in round 1;
  *  - ppm integers instead of double ratios follow the cross-engine
  *    exactness rule (ratio-of-small-ints round() boundaries differ
  *    across engines — see CLAUDE.md);
  *  - and because the stub codec is a *deterministic* function of the
  *    payload bytes, DuckDB can replay it via hex(encode(text)) —
  *    upgrading q50 from rows-only to a full oracle check.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q50_multimodal_features" -> { (s, dir) =>
      val feats = Multimodal.extractFeatures(
        Multimodal.syntheticFromDocuments(Tables.load(s, dir, "documents")))
        .toDF()
      // count recovered exactly from share*n (share was count/n in
      // double; round() undoes the single rounding), then ppm via
      // integer div so both engines hit identical integers.
      feats
        .select(col("id"), col("media_type"), col("n_bytes").cast("long").as("n_bytes"),
          posexplode(col("features")).as(Seq("bin", "share")))
        .selectExpr(
          "id", "media_type", "n_bytes",
          "CAST(bin AS BIGINT) AS bin",
          "CAST(round(share * greatest(n_bytes, 1)) AS BIGINT) * 1000000 div greatest(n_bytes, 1) AS share_ppm")
    },
  )

  // DuckDB replay of the stub codec: high nibble of byte i of the
  // utf-8 payload = hex digit at position 2i+1 of hex(encode(text)).
  val oracles: Map[String, String] = Map(
    "q50_multimodal_features" ->
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    'media/' || CAST(doc_id % 3 AS VARCHAR) AS media_type,
        |    hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS nb
        |  FROM documents),
        |pos AS (
        |  SELECT id, hx,
        |    unnest(generate_series(1, 2 * nb - 1, 2)) AS p
        |  FROM d WHERE nb > 0),
        |cnt AS (
        |  SELECT id,
        |    strpos('0123456789ABCDEF', substring(hx, p, 1)) - 1 AS bin,
        |    count(*) AS c
        |  FROM pos GROUP BY 1, 2)
        |SELECT d.id, d.media_type, CAST(d.nb AS BIGINT) AS n_bytes,
        |  CAST(bins.bin AS BIGINT) AS bin,
        |  CAST(coalesce(cnt.c, 0) * 1000000 // greatest(d.nb, 1) AS BIGINT) AS share_ppm
        |FROM d
        |CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bin) bins
        |LEFT JOIN cnt ON cnt.id = d.id AND cnt.bin = bins.bin""".stripMargin,
  )
}
