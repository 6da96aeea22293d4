package graft.operators

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal pipeline exposed as driver-gate queries (rows-only:
  * the decode stage is a stubbed codec, see graft.multimodal). */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q50_multimodal_features" -> { (s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.syntheticFromDocuments(Tables.load(s, dir, "documents")))
        .toDF()
    },
  )

  val oracles: Map[String, String] = Map.empty
}
