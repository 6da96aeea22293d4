package graft.operators

import graft.Tables
import graft.pipeline.{DagCompiler, PipelineSpec, Transform, TransformRegistry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** q93 — the north-star LLM corpus-prep chain, driven END-TO-END by
  * the §2.10 declarative DAG compiler rather than hand-wired code:
  *
  *   clean (q80 predicate) → near-dup dedup keep (q53 machinery) →
  *   temperature mix (q89) → shard/pack (q90) → chunk (q92)
  *
  * The spec below is a transformations.json-shaped document (the
  * reference's pipeline language, /root/reference/README.md:82-103):
  * the heavy stages are REGISTERED transforms (the dynamic-code
  * surface, analysis.py:93-126) and the chunk stage is pure builtin
  * `op` nodes — both halves of §2.10 carry real work in one DAG.
  *
  * Every stage is the SAME composable form its standalone gate query
  * uses (TextAnalysis.cleanKeep, Dedup.dedupKeep,
  * Mixing.temperatureKeep/shardPack, the q92 selectExprs), with the
  * same splitmix64 salts — so the DuckDB oracle is the CTE chain of
  * the stages' own generated SQL, scoped stage-over-stage.
  *
  * Scale notes: the one NEW wrinkle vs the standalone queries is that
  * `text` rides the q90 shard shuffle (the chunk stage consumes it
  * next; one shuffle moving text once beats a skinny pack plus a
  * second join shuffle to re-attach it), and the cleaned frame is
  * persisted because the dedup stage's plan-time hot-gram collect and
  * the main action both read it. PlanShapeSpec pins the composed
  * shapes: rates broadcast, chunk explode map-side above the single
  * Window, no cartesian anywhere.
  */
object CorpusPipeline {
  type Q = (SparkSession, String) => DataFrame

  private val specJson =
    """{
      |  "Main": {
      |    "load_documents": {
      |      "needed-data": ["documents"],
      |      "op": {"kind": "table", "table": "documents"}
      |    },
      |    "clean": {"dependencies": {"load_documents": "df"}},
      |    "dedup_keep": {"dependencies": {"clean": "df"}},
      |    "temperature_mix": {"dependencies": {"dedup_keep": "df"}},
      |    "shard_pack": {"dependencies": {"temperature_mix": "df"}},
      |    "chunk_prep": {
      |      "dependencies": {"shard_pack": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "text",
      |        "CAST(length(text) AS BIGINT) AS len"]}
      |    },
      |    "chunk_ids": {
      |      "dependencies": {"chunk_prep": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "text",
      |        "explode(sequence(CAST(0 AS BIGINT), (1 + (greatest(len - 200, 0) + 149) div 150) - 1)) AS chunk_id"]}
      |    },
      |    "chunk_out": {
      |      "dependencies": {"chunk_ids": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "chunk_id",
      |        "substring(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk_text",
      |        "CAST(length(substring(text, CAST(chunk_id * 150 + 1 AS INT), 200)) AS BIGINT) AS chunk_len"]},
      |      "is-output": true
      |    }
      |  }
      |}""".stripMargin

  /** q104 — the SECOND-generation chain (round 7): the q99 span scrub
    * runs FIRST (the modern prep order — strip cross-doc boilerplate
    * BEFORE quality filtering, so a doc isn't judged on text that is
    * about to be removed), then the same five q93 stages over the
    * scrubbed text. One new registered transform drops in and every
    * downstream stage chains unchanged — the pipeline-generality claim
    * made concrete. */
  private[graft] val specJsonV2 =
    """{
      |  "Main": {
      |    "load_documents": {
      |      "needed-data": ["documents"],
      |      "op": {"kind": "table", "table": "documents"}
      |    },
      |    "scrub": {"dependencies": {"load_documents": "df"}},
      |    "clean": {"dependencies": {"scrub": "df"}},
      |    "dedup_keep": {"dependencies": {"clean": "df"}},
      |    "temperature_mix": {"dependencies": {"dedup_keep": "df"}},
      |    "shard_pack": {"dependencies": {"temperature_mix": "df"}},
      |    "chunk_prep": {
      |      "dependencies": {"shard_pack": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "text",
      |        "CAST(length(text) AS BIGINT) AS len"]}
      |    },
      |    "chunk_ids": {
      |      "dependencies": {"chunk_prep": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "text",
      |        "explode(sequence(CAST(0 AS BIGINT), (1 + (greatest(len - 200, 0) + 149) div 150) - 1)) AS chunk_id"]}
      |    },
      |    "chunk_out": {
      |      "dependencies": {"chunk_ids": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "chunk_id",
      |        "substring(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk_text",
      |        "CAST(length(substring(text, CAST(chunk_id * 150 + 1 AS INT), 200)) AS BIGINT) AS chunk_len"]},
      |      "is-output": true
      |    }
      |  }
      |}""".stripMargin

  /** q143 — the THIRD-generation chain (round 8, the modern curation
    * pipeline): the q104 spine with the two round-7 quality stages
    * spliced in after cleaning —
    *
    *   scrub (q99) → clean (q80) → CCNet head-keep (q123's terciles
    *   as a filter) → SemDeDup (q102, on the survivors' embeddings) →
    *   temperature mix (q89) → shard pack (q90) → chunk (q92)
    *
    * The SemDeDup stage is the pipeline's first TWO-INPUT node: it
    * binds the surviving docs AND the embeddings table (the DAG
    * compiler's multi-dependency argument binding, utils.py:120-229
    * semantics), restricting the vector corpus to the docs still
    * alive — the cell ladder and the prune run on the pipeline's
    * state, not the raw table, identically in the oracle. Docs with
    * no embedding row pass through (at sf0.1 three in five). */
  private[graft] val specJsonV3 =
    """{
      |  "Main": {
      |    "load_documents": {
      |      "needed-data": ["documents"],
      |      "op": {"kind": "table", "table": "documents"}
      |    },
      |    "load_embeddings": {
      |      "needed-data": ["embeddings"],
      |      "op": {"kind": "table", "table": "embeddings"}
      |    },
      |    "scrub": {"dependencies": {"load_documents": "df"}},
      |    "clean": {"dependencies": {"scrub": "df"}},
      |    "head_keep": {"dependencies": {"clean": "df"}},
      |    "semdedup_keep": {
      |      "dependencies": {"head_keep": "df", "load_embeddings": "emb"}
      |    },
      |    "temperature_mix": {"dependencies": {"semdedup_keep": "df"}},
      |    "shard_pack": {"dependencies": {"temperature_mix": "df"}},
      |    "chunk_prep": {
      |      "dependencies": {"shard_pack": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "text",
      |        "CAST(length(text) AS BIGINT) AS len"]}
      |    },
      |    "chunk_ids": {
      |      "dependencies": {"chunk_prep": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "text",
      |        "explode(sequence(CAST(0 AS BIGINT), (1 + (greatest(len - 200, 0) + 149) div 150) - 1)) AS chunk_id"]}
      |    },
      |    "chunk_out": {
      |      "dependencies": {"chunk_ids": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "chunk_id",
      |        "substring(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk_text",
      |        "CAST(length(substring(text, CAST(chunk_id * 150 + 1 AS INT), 200)) AS BIGINT) AS chunk_len"]},
      |      "is-output": true
      |    }
      |  }
      |}""".stripMargin

  /** q153 — the FOURTH-generation chain (round 9): the q143 spine
    * with the TRAINED discriminative quality filter spliced in after
    * SemDeDup —
    *
    *   scrub → clean → head-keep → SemDeDup → **classifier keep**
    *   (q144's pocket perceptron, trained on the raw labeled corpus,
    *   scoring the pipeline's survivors; keep = top half by score at
    *   bin granularity) → temperature mix → shard pack → chunk
    *
    * Modern curation (RefinedWeb / the GPT-3 quality filter) gates on
    * a TRAINED classifier score, not only on heuristics — and the
    * engine trains its own. The `train_quality` node is a DAG node
    * whose OUTPUT IS A MODEL (the pocket weight table), and
    * `classifier_keep` is the pipeline's second two-input transform,
    * binding the document stream to that trained state — the compiler
    * provably carries trained state between stages. */
  private[graft] val specJsonV4 =
    """{
      |  "Main": {
      |    "load_documents": {
      |      "needed-data": ["documents"],
      |      "op": {"kind": "table", "table": "documents"}
      |    },
      |    "load_embeddings": {
      |      "needed-data": ["embeddings"],
      |      "op": {"kind": "table", "table": "embeddings"}
      |    },
      |    "scrub": {"dependencies": {"load_documents": "df"}},
      |    "clean": {"dependencies": {"scrub": "df"}},
      |    "head_keep": {"dependencies": {"clean": "df"}},
      |    "semdedup_keep": {
      |      "dependencies": {"head_keep": "df", "load_embeddings": "emb"}
      |    },
      |    "train_quality": {"dependencies": {"load_documents": "df"}},
      |    "classifier_keep": {
      |      "dependencies": {"semdedup_keep": "df", "train_quality": "weights"}
      |    },
      |    "temperature_mix": {"dependencies": {"classifier_keep": "df"}},
      |    "shard_pack": {"dependencies": {"temperature_mix": "df"}},
      |    "chunk_prep": {
      |      "dependencies": {"shard_pack": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "text",
      |        "CAST(length(text) AS BIGINT) AS len"]}
      |    },
      |    "chunk_ids": {
      |      "dependencies": {"chunk_prep": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "text",
      |        "explode(sequence(CAST(0 AS BIGINT), (1 + (greatest(len - 200, 0) + 149) div 150) - 1)) AS chunk_id"]}
      |    },
      |    "chunk_out": {
      |      "dependencies": {"chunk_ids": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "chunk_id",
      |        "substring(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk_text",
      |        "CAST(length(substring(text, CAST(chunk_id * 150 + 1 AS INT), 200)) AS BIGINT) AS chunk_len"]},
      |      "is-output": true
      |    }
      |  }
      |}""".stripMargin

  /** q163 — the v4 chain with the training node swapped for its
    * SAMPLED sibling (`Perceptron.trainPocketSampled`): the trained
    * gate's 100 TB posture — K epochs over a ~fixed-size deterministic
    * splitmix64 doc sample instead of K full-corpus scans, the full
    * corpus touched only by the scoring pass. The spec is the v4
    * document with one node renamed — the declarative surface is the
    * point: swapping a training strategy is a spec edit, not a
    * pipeline rewrite. */
  private[graft] val specJsonV5 =
    specJsonV4.replace("train_quality", "train_quality_sampled")

  /** q176 — the MULTIMODAL pipeline spec, v6 (round-10 verdict #4):
    * the DAG compiler carrying the multimodal families the way
    * v1–v5 carry text — scrub → text dedup-upweight (over the
    * SCRUBBED text: the pipeline's state, not the raw table) in one
    * branch, the scale-tied image corpus → near-dup pairs → manifest
    * in the other, merged into the per-(source, modality) census and
    * finished by the cross-modal temperature planner. Three new node
    * kinds (`image_neardups`, `image_manifest`, `manifest_merge`,
    * `effective_mix`) and the DAG's first DIAMOND over load_documents
    * (both branches and the merge bind it) — all compiled into ONE
    * plan. Audio/video ride the identical machinery (q167b proves the
    * four-way composition); the compiled gate keeps the two-modality
    * form so the pipeline's cost stays the sum of its audited stages. */
  private[graft] val specJsonV6 =
    """{
      |  "Main": {
      |    "load_documents": {
      |      "needed-data": ["documents"],
      |      "op": {"kind": "table", "table": "documents"}
      |    },
      |    "scrub": {"dependencies": {"load_documents": "df"}},
      |    "text_manifest": {"dependencies": {"scrub": "df"}},
      |    "image_neardups": {"dependencies": {"load_documents": "df"}},
      |    "image_manifest": {
      |      "dependencies": {"load_documents": "ids", "image_neardups": "pairs"}
      |    },
      |    "manifest_merge": {
      |      "dependencies": {"load_documents": "docs",
      |                       "text_manifest": "text_man",
      |                       "image_manifest": "img_man"}
      |    },
      |    "effective_mix": {
      |      "dependencies": {"manifest_merge": "census"},
      |      "is-output": true
      |    }
      |  }
      |}""".stripMargin

  /** q183 — the QUAD-modal pipeline spec, v7: v6's diamond widened to
    * every modality the engine manifests — scrub → text dedup-upweight
    * in the text branch; the three scale-tied media corpora (image/
    * audio/video, one synthesized artifact per documents row) each
    * through near-dups → manifest in their own branch; all four merged
    * into the per-(source, modality) census and finished by the
    * cross-modal temperature planner. The DAG's widest node
    * (`manifest_merge_quad` binds FIVE upstream nodes) and widest
    * diamond (load_documents fans out to scrub + three media branches
    * + the merge). Every branch is its audited gate shape (q149 over
    * scrub survivors / q164 / q171 / q173) — the pipeline composes,
    * never re-derives. */
  private[graft] val specJsonV7 =
    """{
      |  "Main": {
      |    "load_documents": {
      |      "needed-data": ["documents"],
      |      "op": {"kind": "table", "table": "documents"}
      |    },
      |    "scrub": {"dependencies": {"load_documents": "df"}},
      |    "text_manifest": {"dependencies": {"scrub": "df"}},
      |    "image_neardups": {"dependencies": {"load_documents": "df"}},
      |    "image_manifest": {
      |      "dependencies": {"load_documents": "ids", "image_neardups": "pairs"}
      |    },
      |    "audio_neardups": {"dependencies": {"load_documents": "df"}},
      |    "audio_manifest": {
      |      "dependencies": {"load_documents": "ids", "audio_neardups": "pairs"}
      |    },
      |    "video_neardups": {"dependencies": {"load_documents": "df"}},
      |    "video_manifest": {
      |      "dependencies": {"load_documents": "ids", "video_neardups": "pairs"}
      |    },
      |    "manifest_merge_quad": {
      |      "dependencies": {"load_documents": "docs",
      |                       "text_manifest": "text_man",
      |                       "image_manifest": "img_man",
      |                       "audio_manifest": "aud_man",
      |                       "video_manifest": "vid_man"}
      |    },
      |    "effective_mix": {
      |      "dependencies": {"manifest_merge_quad": "census"},
      |      "is-output": true
      |    }
      |  }
      |}""".stripMargin

  /** q194 — the AUTO-TUNED pipeline spec, v8: the curation spine with
    * the dedup stage's config CHOSEN BY MEASUREMENT instead of fixed —
    * the q192 decision loop closed inside a compiled DAG. A new
    * `auto_banding` node runs the q180 banding frontier on a
    * deterministic 1-in-2 calibration sample (exact truth on the
    * sample only — at 100 TB you tune on a slice, never corpus-wide)
    * and selects the cheapest lossless banding by the q192 total
    * order; `dedup_keep_lsh` consumes the selection (a 1-row
    * plan-time collect, the hot-gram precedent) and instantiates the
    * q45 MinHash-LSH dedup at the chosen banding — the pipeline's
    * dedup plan is built FROM the measurement.
    *
    * v8 also REORDERS the spine: dedup runs FIRST, on the raw
    * corpus, then scrub → clean → mix → pack → chunk. Two reasons,
    * one of them measured on THIS corpus: (a) hash-based near-dup
    * dedup is the cheapest stage and cutting duplicates first saves
    * every downstream stage their cost — the standard production
    * order; (b) the calibration probe measured that BOTH the span
    * scrub and the quality clean destroy the near-dup signal here
    * (raw J ≥ 0.5 truth 25/256 pairs at sf0.01/sf0.1; scrubbed truth
    * 0; cleaned truth 0 — the planted duplicates are boilerplate-
    * heavy, low-quality texts), so a post-clean dedup stage is a
    * no-op on this corpus and an auto-tuned one would measure only
    * its own fallback. Dedup-first is where the decision is real. */
  private[graft] val specJsonV8 =
    """{
      |  "Main": {
      |    "load_documents": {
      |      "needed-data": ["documents"],
      |      "op": {"kind": "table", "table": "documents"}
      |    },
      |    "auto_banding": {"dependencies": {"load_documents": "df"}},
      |    "dedup_keep_lsh": {
      |      "dependencies": {"load_documents": "df", "auto_banding": "sel"}
      |    },
      |    "scrub": {"dependencies": {"dedup_keep_lsh": "df"}},
      |    "clean": {"dependencies": {"scrub": "df"}},
      |    "temperature_mix": {"dependencies": {"clean": "df"}},
      |    "shard_pack": {"dependencies": {"temperature_mix": "df"}},
      |    "chunk_prep": {
      |      "dependencies": {"shard_pack": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "text",
      |        "CAST(length(text) AS BIGINT) AS len"]}
      |    },
      |    "chunk_ids": {
      |      "dependencies": {"chunk_prep": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "text",
      |        "explode(sequence(CAST(0 AS BIGINT), (1 + (greatest(len - 200, 0) + 149) div 150) - 1)) AS chunk_id"]}
      |    },
      |    "chunk_out": {
      |      "dependencies": {"chunk_ids": "df"},
      |      "op": {"kind": "select", "exprs": [
      |        "doc_id", "lang", "shard", "bin", "chunk_id",
      |        "substring(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk_text",
      |        "CAST(length(substring(text, CAST(chunk_id * 150 + 1 AS INT), 200)) AS BIGINT) AS chunk_len"]},
      |      "is-output": true
      |    }
      |  }
      |}""".stripMargin

  private def in(args: Map[String, Any]): DataFrame =
    args("df").asInstanceOf[DataFrame]

  /** The dynamic-code half of the DAG: each heavy stage is the shared
    * composable operator. Two stage outputs are persisted (CLAUDE.md
    * rule: cache inputs referenced more than once; MEMORY_AND_DISK,
    * spills rather than OOMs): `clean` is read by the dedup stage's
    * plan-time hot-gram collect AND the main action; `dedup_keep` is
    * read TWICE by temperatureKeep (the per-language rate aggregate
    * and the main join) — without the persist the whole candidate +
    * verify + anti-join chain would execute once per reference. The
    * registry records what it persisted so the query can release the
    * stage caches once the pipeline's result is materialized (round-5
    * advice: they otherwise stay resident for the session). */
  private def registry(persisted: scala.collection.mutable.Buffer[DataFrame]) = {
    def cached(f: DataFrame): DataFrame = { persisted += f.persist(); f }
    TransformRegistry(
      // scrub output is persisted too (q104): the clean stage's plan
      // references its input ~6 times (base/bigram/contamination/
      // canonical legs) — without the cache the whole span-scrub
      // subtree would re-execute per leg
      "scrub" -> Transform(a => cached(RepeatedSpans.scrubKeep(in(a)))),
      "clean" -> Transform(a => cached(TextAnalysis.cleanKeep(in(a)))),
      "dedup_keep" -> Transform(a => cached(Dedup.dedupKeep(in(a)))),
      // q143 stages: head_keep's output feeds the SemDeDup restrict
      // AND the anti-join base (plus the surprisal checkpoint reads
      // its input once more); semdedup_keep's is read twice by
      // temperatureKeep (rate aggregate + main join) — both persist
      "head_keep" -> Transform(a => cached(Curation.headKeep(in(a)))),
      "semdedup_keep" -> Transform(a => cached(Similarity.semDedupKeepDocs(
        in(a), a("emb").asInstanceOf[DataFrame], threshold = 0.4))),
      // q153 stages: train_quality's output IS the model — a ≤(B+1)-
      // row weight table passed between DAG nodes like any frame
      // (training runs its K bounded epochs at pipeline-build time,
      // the dedup hot-gram precedent); classifier_keep's output is
      // read twice by temperatureKeep → persisted
      "train_quality" -> Transform(a => Perceptron.trainPocket(in(a))),
      // q163: the sampled sibling — per-epoch work is sample-sized
      "train_quality_sampled" ->
        Transform(a => Perceptron.trainPocketSampled(in(a))),
      "classifier_keep" -> Transform(a => cached(Perceptron.classifierKeep(
        in(a), a("weights").asInstanceOf[DataFrame]))),
      // q194 nodes: auto_banding measures the q180 frontier on the
      // 1-in-2 calibration sample of the raw corpus (frontier
      // checkpoints run at DAG-build time — the hot-gram /
      // train_quality precedent); dedup_keep_lsh collects the ONE
      // selection row and instantiates the LSH dedup at the chosen
      // banding. Its output feeds the scrub stage, whose span plan
      // references its input several times → persisted.
      "auto_banding" ->
        Transform(a => AutoConfig.sampledBandingChoice(in(a))),
      "dedup_keep_lsh" -> Transform(a => {
        val cfg = a("sel").asInstanceOf[DataFrame].head.getString(0)
        cached(Dedup.dedupKeepLsh(in(a), AutoConfig.bandsOf(cfg)))
      }),
      "temperature_mix" -> Transform(a => Mixing.temperatureKeep(in(a))),
      "shard_pack" -> Transform(a => Mixing.shardPack(in(a))),
      // q176 multimodal nodes: the text manifest runs on the SCRUBBED
      // text (the pipeline's state); the image branch synthesizes the
      // scale-tied corpus from the DAG's own loaded table; the census
      // checkpoint lives inside mergeCensus (read twice by the mix)
      "text_manifest" -> Transform(a => Dedup.dedupUpweight(in(a))
        .select(col("doc_id").as("id"), col("multiplicity"))),
      "image_neardups" ->
        Transform(a => ImageDedup.scaledNearDupsFrom(in(a))),
      "image_manifest" -> Transform(a => ImageDedup.manifestFrom(
        a("ids").asInstanceOf[DataFrame]
          .select(col("doc_id").as("id")),
        a("pairs").asInstanceOf[DataFrame])),
      "manifest_merge" -> Transform(a => CrossModal.mergeCensus(
        a("docs").asInstanceOf[DataFrame],
        a("text_man").asInstanceOf[DataFrame],
        a("img_man").asInstanceOf[DataFrame])),
      // q183 quad-modal nodes: the audio/video branches are the
      // q171/q173 scale-tied corpora over the DAG's own loaded table
      // (the scaledImagesFrom seam, per-modality literals); their
      // manifest nodes reuse the image node's generic body
      "audio_neardups" ->
        Transform(a => AudioDedup.scaledNearDupsFrom(in(a))),
      "audio_manifest" -> Transform(a => ImageDedup.manifestFrom(
        a("ids").asInstanceOf[DataFrame]
          .select(col("doc_id").as("id")),
        a("pairs").asInstanceOf[DataFrame])),
      "video_neardups" ->
        Transform(a => VideoDedup.scaledNearDupsFrom(in(a))),
      "video_manifest" -> Transform(a => ImageDedup.manifestFrom(
        a("ids").asInstanceOf[DataFrame]
          .select(col("doc_id").as("id")),
        a("pairs").asInstanceOf[DataFrame])),
      "manifest_merge_quad" -> Transform(a => CrossModal.mergeCensusQuad(
        a("docs").asInstanceOf[DataFrame],
        a("text_man").asInstanceOf[DataFrame],
        a("img_man").asInstanceOf[DataFrame],
        a("aud_man").asInstanceOf[DataFrame],
        a("vid_man").asInstanceOf[DataFrame])),
      "effective_mix" ->
        Transform(a => CrossModal.mixRatesFrom(
          a("census").asInstanceOf[DataFrame])))
  }

  /** The compiled (UN-materialized) pipeline plus the stage frames the
    * registry persisted while building it — exposed so PlanShapeSpec
    * can audit the composed Catalyst plan (the shipped query function
    * below checkpoints, which collapses the visible plan to the
    * materialized RDD scan). */
  private[graft] def buildPipeline(s: SparkSession, dir: String,
      spec: String = specJson,
      docsOverride: Option[DataFrame] = None,
      embOverride: Option[DataFrame] = None): (DataFrame, Seq[DataFrame]) = {
    val persisted = scala.collection.mutable.Buffer.empty[DataFrame]
    val blocks = PipelineSpec.fromJson(spec)
    val out = DagCompiler.runPipeline(
      blocks("Main"), registry(persisted),
      data = Map(
        // overrides: the scale probe feeds replicated frames through
        // the identical compiled DAG (gate queries never pass them)
        "documents" -> docsOverride.getOrElse(Tables.load(s, dir, "documents")),
        "embeddings" -> embOverride.getOrElse(Tables.load(s, dir, "embeddings"))),
      params = Map.empty, spark = Some(s)).asInstanceOf[DataFrame]
    (out, persisted.toSeq)
  }

  /** Materialize ONCE (eager localCheckpoint — also cuts the lineage
    * so downstream actions never re-enter the stage plans), then
    * release the stage caches: cached blocks no longer outlive the
    * query, and the caller's action reads the checkpointed blocks,
    * which the ContextCleaner reclaims when the frame goes out of
    * scope. The checkpoint runs inside the query function, so Bench
    * still times the full pipeline execution. */
  private def materialized(s: SparkSession, dir: String, spec: String)
      : DataFrame = {
    val (out, persisted) = buildPipeline(s, dir, spec)
    val result = out.localCheckpoint(true)
    persisted.foreach(_.unpersist(false))
    result
  }

  val queries: Map[String, Q] = Map(
    "q93_corpus_prep_pipeline" -> { (s, dir) =>
      materialized(s, dir, specJson)
    },
    "q104_corpus_prep_scrubbed" -> { (s, dir) =>
      materialized(s, dir, specJsonV2)
    },
    "q143_corpus_prep_v3" -> { (s, dir) =>
      materialized(s, dir, specJsonV3)
    },
    "q153_corpus_prep_v4" -> { (s, dir) =>
      materialized(s, dir, specJsonV4)
    },
    "q163_corpus_prep_sampled" -> { (s, dir) =>
      materialized(s, dir, specJsonV5)
    },
    "q176_multimodal_pipeline" -> { (s, dir) =>
      materialized(s, dir, specJsonV6)
    },

    // -- q183 (round 12): the QUAD-modal compiled pipeline — v6's
    //    diamond widened to all four modalities: scrub → text
    //    dedup-upweight beside the three scale-tied media branches
    //    (image/audio/video near-dups → manifests), merged into one
    //    per-(source, modality) census and planned by the cross-modal
    //    temperature rule, all compiled into ONE plan by the DAG
    //    compiler (its widest merge node: five dependencies). --
    "q183_quadmodal_pipeline" -> { (s, dir) =>
      materialized(s, dir, specJsonV7)
    },

    // -- q194 (round 13): the AUTO-TUNED pipeline — dedup runs FIRST
    //    (on the raw corpus, where the near-dup signal measurably
    //    lives — scrub and clean both destroy it; see specJsonV8),
    //    at a banding selected at plan time from a sampled q180
    //    frontier by the q192 total order instead of fixed by
    //    convention. The compiled plan is built FROM the measurement:
    //    PlanShapeSpec pins that the selected banding's slice widths
    //    appear in the dedup explode and no other banding's do. --
    "q194_autotuned_pipeline" -> { (s, dir) =>
      materialized(s, dir, specJsonV8)
    },
  )

  /** The v4 composed oracle parameterized over the training CTE
    * chain — q153 passes the full-corpus `trainCtes`, q163 the
    * sampled `trainCtesSampled`; both end at `wp(b, w)`, which the
    * shared classifier-keep fragment scores with. */
  private def v4OracleWith(trainCtes: String): String =
    s"""WITH $trainCtes,
       |scrubbed AS MATERIALIZED (
       |${RepeatedSpans.scrubSql("documents")}),
       |cleaned AS MATERIALIZED (
       |  SELECT d.doc_id, d.lang, d.text
       |  FROM scrubbed d JOIN (
       |${TextAnalysis.cleanKeepIdsSql("scrubbed")}
       |) k USING (doc_id)),
       |headkept AS MATERIALIZED (
       |  SELECT d.doc_id, d.lang, d.text
       |  FROM cleaned d JOIN (
       |${Curation.headKeepIdsSql("cleaned")}
       |) k USING (doc_id)),
       |embsub AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding
       |  FROM embeddings e JOIN headkept h ON e.vec_id = h.doc_id),
       |semkept AS MATERIALIZED (
       |  SELECT doc_id, lang, text FROM headkept
       |  WHERE doc_id NOT IN (SELECT vec_id FROM (
       |${Similarity.semDedupRemovedSql("embsub", "0.4")}
       |))),
       |clskept AS (
       |  SELECT d.doc_id, d.lang, d.text
       |  FROM semkept d JOIN (
       |${Perceptron.classifierKeepIdsSql("semkept")}
       |) k USING (doc_id)),
       |mixed AS (
       |${Mixing.temperatureSql("clskept", "d.doc_id, d.lang, d.text")}),
       |packed AS (
       |${Mixing.shardPackSql("mixed", "doc_id, lang, text, shard")}),
       |${TextAnalysis.chunkSql("packed", "doc_id, lang, shard, bin")
            .stripPrefix("WITH ")}""".stripMargin

  /** The cross-modal temperature tail over a `census(source, modality,
    * n_items, n_canonical, n_effective)` CTE — per-modality mins, the
    * q89 rule over raw and effective items, the q170 zero-clamp.
    * Shared by oracle176 and oracle183. */
  private def mixTailSql: String =
    s"""mins AS (
       |  SELECT modality, min(n_items) AS m_min,
       |    coalesce(min(n_effective) FILTER (WHERE n_effective > 0), 0)
       |      AS e_min
       |  FROM census GROUP BY modality)
       |SELECT c.source, c.modality, c.n_items, c.n_canonical,
       |  c.n_effective,
       |  CAST(floor(sqrt(CAST(m_min AS DOUBLE)
       |    / CAST(c.n_items AS DOUBLE)) * 1000000) AS BIGINT)
       |    AS rate_raw_ppm,
       |  CASE WHEN c.n_effective = 0 THEN CAST(0 AS BIGINT)
       |    ELSE CAST(floor(sqrt(CAST(e_min AS DOUBLE)
       |      / CAST(c.n_effective AS DOUBLE)) * 1000000) AS BIGINT)
       |    END AS rate_eff_ppm,
       |  CASE WHEN c.n_effective = 0 THEN CAST(0 AS BIGINT)
       |    ELSE CAST(floor(sqrt(CAST(e_min AS DOUBLE)
       |      / CAST(c.n_effective AS DOUBLE)) * 1000000) AS BIGINT)
       |    END
       |  - CAST(floor(sqrt(CAST(m_min AS DOUBLE)
       |    / CAST(c.n_items AS DOUBLE)) * 1000000) AS BIGINT)
       |    AS rate_shift_ppm
       |FROM census c JOIN mins m USING (modality)""".stripMargin

  /** The scrub-survivor text manifest CTE (`text_up(id,
    * multiplicity)`) — the q176/q183 pipelines' text branch: CC labels
    * over the SCRUBBED text, cluster multiplicities on canonicals. */
  private def textUpCte(sub: String => String): String =
    s"""text_up AS MATERIALIZED (
       |  WITH RECURSIVE scrubbed AS MATERIALIZED (
       |  ${sub(RepeatedSpans.scrubSql("documents"))}),
       |  ${sub(Dedup.ccLabelCtesOver("scrubbed"))}
       |  SELECT l.doc_id AS id, CAST(m AS BIGINT) AS multiplicity
       |  FROM labels l
       |  JOIN (SELECT cluster_id, count(*) AS m FROM labels
       |        GROUP BY cluster_id) cs ON l.cluster_id = cs.cluster_id
       |  WHERE l.doc_id = l.cluster_id
       |  UNION ALL
       |  SELECT doc_id AS id, 1 AS multiplicity FROM scrubbed
       |  WHERE doc_id NOT IN (SELECT doc_id FROM labels)
       |)""".stripMargin

  private def oracle176: String = {
    def sub(q: String): String = q.linesIterator.mkString("\n  ")
    s"""WITH ${textUpCte(sub)},
       |img_man AS MATERIALIZED (
       |  WITH RECURSIVE ${sub(graft.multimodal.ImageGen.featureSql)},
       |  ${sub(ImageDedup.signLshChainSql(ImageDedup.PlaneCoef,
                ImageDedup.Center, ImageDedup.L1Max))},
       |  ${sub(ImageDedup.manifestSqlOver(
                "SELECT doc_id AS id FROM documents"))}
       |),
       |src AS (SELECT doc_id AS id, source FROM documents),
       |census AS MATERIALIZED (
       |  ${sub(CrossModal.censusSql("text_up", "text", "id"))}
       |  UNION ALL
       |  ${sub(CrossModal.censusSql("img_man", "image", "id"))}),
       |$mixTailSql""".stripMargin
  }

  /** q183: oracle176's text/image chains + the q167b closed-form
    * audio/video manifests, four census fragments, the same
    * temperature tail — the quad pipeline replayed stage for stage. */
  private def oracle183: String = {
    def sub(q: String): String = q.linesIterator.mkString("\n  ")
    val idsSel = "SELECT doc_id AS id FROM documents"
    s"""WITH ${textUpCte(sub)},
       |img_man AS MATERIALIZED (
       |  WITH RECURSIVE ${sub(graft.multimodal.ImageGen.featureSql)},
       |  ${sub(ImageDedup.signLshChainSql(ImageDedup.PlaneCoef,
                ImageDedup.Center, ImageDedup.L1Max))},
       |  ${sub(ImageDedup.manifestSqlOver(idsSel))}
       |),
       |aud_man AS MATERIALIZED (
       |  WITH RECURSIVE ${sub(graft.multimodal.AudioGen.featureSql)},
       |  ${sub(ImageDedup.signLshChainSql(AudioDedup.PlaneCoef,
                AudioDedup.Center, AudioDedup.ScaledL1Max))},
       |  ${sub(ImageDedup.manifestSqlOver(idsSel))}
       |),
       |vid_man AS MATERIALIZED (
       |  WITH RECURSIVE ${sub(graft.multimodal.VideoGen.featureSql)},
       |  ${sub(ImageDedup.signLshChainSql(VideoDedup.PlaneCoef,
                VideoDedup.Center, VideoDedup.ScaledL1Max))},
       |  ${sub(ImageDedup.manifestSqlOver(idsSel))}
       |),
       |src AS (SELECT doc_id AS id, source FROM documents),
       |census AS MATERIALIZED (
       |  ${sub(CrossModal.censusSql("text_up", "text", "id"))}
       |  UNION ALL
       |  ${sub(CrossModal.censusSql("img_man", "image", "id"))}
       |  UNION ALL
       |  ${sub(CrossModal.censusSql("aud_man", "audio", "id"))}
       |  UNION ALL
       |  ${sub(CrossModal.censusSql("vid_man", "video", "id"))}),
       |$mixTailSql""".stripMargin
  }

  /** Composed oracle: each stage's OWN generated SQL, scoped to the
    * previous stage's CTE (DuckDB allows a WITH inside a CTE body;
    * inner names are locally scoped, so the stage fragments nest
    * unchanged). */
  val oracles: Map[String, String] = Map(
    "q93_corpus_prep_pipeline" ->
      s"""WITH cleaned AS MATERIALIZED (
         |  SELECT d.doc_id, d.lang, d.text
         |  FROM documents d JOIN (
         |${TextAnalysis.oracles("q80_clean_corpus")}
         |) k USING (doc_id)),
         |deduped AS (
         |  SELECT doc_id, lang, text FROM cleaned
         |  WHERE doc_id NOT IN (SELECT doc_id FROM (
         |${Dedup.neardupDropSql("cleaned")}
         |))),
         |mixed AS (
         |${Mixing.temperatureSql("deduped", "d.doc_id, d.lang, d.text")}),
         |packed AS (
         |${Mixing.shardPackSql("mixed", "doc_id, lang, text, shard")}),
         |${TextAnalysis.chunkSql("packed", "doc_id, lang, shard, bin")
              .stripPrefix("WITH ")}""".stripMargin,

    // v2: the span scrub prepended, then the identical five stages
    // chained over the SCRUBBED text — each fragment is the stage's
    // own generated SQL, scoped to the previous CTE (the q93 playbook).
    // The scrub/clean CTEs are MATERIALIZED: DuckDB inlines CTEs by
    // default, so each downstream reference would re-evaluate the
    // whole upstream chain (the clean fragment alone reads its input
    // 3×) — the same duplication the engine's stage persist avoids.
    // v3: scrub → clean → CCNet head-keep → SemDeDup → mix → pack →
    // chunk. Each fragment is the stage's own generated SQL scoped to
    // the previous CTE (the q93/q104 playbook). scrubbed/cleaned/
    // headkept/embsub are MATERIALIZED — each is referenced by at
    // least two downstream legs, and DuckDB's default CTE inlining
    // would re-evaluate the whole upstream chain per reference (the
    // same duplication the engine's stage persists avoid). The
    // SemDeDup fragment runs on embsub = embeddings ∩ surviving docs,
    // so its count(*) cell ladder sees the pipeline's state exactly
    // as the engine's restricted frame does; docs outside embeddings
    // survive the NOT IN by construction.
    "q143_corpus_prep_v3" ->
      s"""WITH scrubbed AS MATERIALIZED (
         |${RepeatedSpans.scrubSql("documents")}),
         |cleaned AS MATERIALIZED (
         |  SELECT d.doc_id, d.lang, d.text
         |  FROM scrubbed d JOIN (
         |${TextAnalysis.cleanKeepIdsSql("scrubbed")}
         |) k USING (doc_id)),
         |headkept AS MATERIALIZED (
         |  SELECT d.doc_id, d.lang, d.text
         |  FROM cleaned d JOIN (
         |${Curation.headKeepIdsSql("cleaned")}
         |) k USING (doc_id)),
         |embsub AS MATERIALIZED (
         |  SELECT e.vec_id, e.embedding
         |  FROM embeddings e JOIN headkept h ON e.vec_id = h.doc_id),
         |semkept AS (
         |  SELECT doc_id, lang, text FROM headkept
         |  WHERE doc_id NOT IN (SELECT vec_id FROM (
         |${Similarity.semDedupRemovedSql("embsub", "0.4")}
         |))),
         |mixed AS (
         |${Mixing.temperatureSql("semkept", "d.doc_id, d.lang, d.text")}),
         |packed AS (
         |${Mixing.shardPackSql("mixed", "doc_id, lang, text, shard")}),
         |${TextAnalysis.chunkSql("packed", "doc_id, lang, shard, bin")
              .stripPrefix("WITH ")}""".stripMargin,

    // v4: the v3 chain + the trained classifier gate. The pocket
    // weights train on the RAW documents table (Perceptron.trainCtes,
    // identically to q144 — the engine's train_quality node binds
    // load_documents), and the cf_ scoring chain runs over `semkept`,
    // the pipeline's state at that stage, exactly as the engine's
    // classifier_keep scores the SemDeDup survivors. semkept is now
    // MATERIALIZED (read by the scoring featurization AND the keep
    // join); the binned threshold replays the engine's shifted
    // nonnegative integer div.
    "q153_corpus_prep_v4" -> v4OracleWith(Perceptron.trainCtes),

    // q163: the identical composed chain — the training CTEs swap to
    // the sampled variant (tok reads the splitmix64-filtered
    // documents), everything downstream byte-identical.
    "q163_corpus_prep_sampled" -> v4OracleWith(Perceptron.trainCtesSampled),

    // q176: the compiled multimodal chain replayed — the text
    // manifest's CC labels run over the SCRUBBED text (the nested
    // scrubbed CTE, exactly the pipeline's state), the image manifest
    // is the q164 closed-form chain, then the shared census fragments
    // and the per-modality temperature rates (the q170 convention,
    // zero-effective clamp included). text_up/img_man MATERIALIZED:
    // each is read by its census's two legs, and DuckDB's default CTE
    // inlining would re-run the recursive chains per reference.
    "q176_multimodal_pipeline" -> oracle176,

    // q183: the quad-modal chain replayed — the scrubbed text CC
    // manifest, the three closed-form media manifests (image region
    // arithmetic / audio segment closed form / video pooled census),
    // four shared census fragments, the temperature tail.
    "q183_quadmodal_pipeline" -> oracle183,

    // q194: the dedup-FIRST spine with the dedup stage replayed at
    // the AUTO-SELECTED banding — dsample is the engine's
    // deterministic 1-in-2 calibration slice of the raw corpus, sel
    // the nested sampled-frontier + q192 total order (scoped WITH —
    // its token/sig chains never clash with the full-corpus ones),
    // and the drop set is every banding's verified-drop chain over
    // the raw corpus gated by the selection scalar (DuckDB cannot
    // prune data-dependently, so it pays all four chains — the
    // honest replay of a plan-time choice). deduped/scrubbed/cleaned
    // MATERIALIZED (multi-read).
    "q194_autotuned_pipeline" -> {
      def sub(q: String): String = q.linesIterator.mkString("\n  ")
      s"""WITH dsample AS MATERIALIZED (
         |  SELECT doc_id, lang, text FROM documents
         |  WHERE doc_id % ${AutoConfig.CalibSampleMod} = 0),
         |sel AS MATERIALIZED (
         |  ${sub(AutoConfig.bandingChoiceSqlOver("dsample"))}
         |),
         |deduped AS MATERIALIZED (
         |  SELECT doc_id, lang, text FROM documents
         |  WHERE doc_id NOT IN (SELECT doc_id FROM (
         |  WITH ${sub(Dedup.lshDropCtesOver("documents"))}
         |  SELECT doc_id FROM dropset
         |))),
         |scrubbed AS MATERIALIZED (
         |${RepeatedSpans.scrubSql("deduped")}),
         |cleaned AS MATERIALIZED (
         |  SELECT d.doc_id, d.lang, d.text
         |  FROM scrubbed d JOIN (
         |${TextAnalysis.cleanKeepIdsSql("scrubbed")}
         |) k USING (doc_id)),
         |mixed AS (
         |${Mixing.temperatureSql("cleaned", "d.doc_id, d.lang, d.text")}),
         |packed AS (
         |${Mixing.shardPackSql("mixed", "doc_id, lang, text, shard")}),
         |${TextAnalysis.chunkSql("packed", "doc_id, lang, shard, bin")
              .stripPrefix("WITH ")}""".stripMargin
    },

    "q104_corpus_prep_scrubbed" ->
      s"""WITH scrubbed AS MATERIALIZED (
         |${RepeatedSpans.scrubSql("documents")}),
         |cleaned AS MATERIALIZED (
         |  SELECT d.doc_id, d.lang, d.text
         |  FROM scrubbed d JOIN (
         |${TextAnalysis.cleanKeepIdsSql("scrubbed")}
         |) k USING (doc_id)),
         |deduped AS (
         |  SELECT doc_id, lang, text FROM cleaned
         |  WHERE doc_id NOT IN (SELECT doc_id FROM (
         |${Dedup.neardupDropSql("cleaned")}
         |))),
         |mixed AS (
         |${Mixing.temperatureSql("deduped", "d.doc_id, d.lang, d.text")}),
         |packed AS (
         |${Mixing.shardPackSql("mixed", "doc_id, lang, text, shard")}),
         |${TextAnalysis.chunkSql("packed", "doc_id, lang, shard, bin")
              .stripPrefix("WITH ")}""".stripMargin,
  )
}
