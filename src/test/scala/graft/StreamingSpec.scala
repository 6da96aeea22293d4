package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String = "append") = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming tumbling-window counts equal the batch equivalent") {
    val stream = EventStreams.readEventsStream(spark, sf0001)
    val got = runToMemory(EventStreams.tumblingCounts(stream), "t_tumbling", "complete")
      .orderBy("window_start", "event_type").collect()
    val want = Tables.load(spark, sf0001, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start", "event_type").collect()
    assert(got.nonEmpty)
    assert(got.sameElements(want))
  }

  test("streaming session windows equal the batch session_window op") {
    val stream = EventStreams.readEventsStream(spark, sf0001)
    val got = runToMemory(EventStreams.sessionCounts(stream), "t_sessions", "complete")
      .orderBy("user_id", "session_start").collect()
    val want = graft.operators.Sessionize.queries("q52_session_window")(spark, sf0001)
      .orderBy("user_id", "session_start").collect()
    assert(got.nonEmpty)
    assert(got.sameElements(want))
  }

  test("sliding windows produce overlapping coverage") {
    val stream = EventStreams.readEventsStream(spark, sf0001)
    val slid = runToMemory(EventStreams.slidingCounts(stream), "t_sliding", "complete")
    // each event lands in window/slide = 2 windows: total n doubles
    val totalN = slid.agg(sum("n")).head().getLong(0)
    assert(totalN === 2 * Tables.load(spark, sf0001, "events").count())
  }

  test("flatMapGroupsWithState accumulates running user totals") {
    val stream = EventStreams.readEventsStream(spark, sf0001)
    val got = runToMemory(EventStreams.runningUserTotals(stream).toDF(), "t_state")
    val want = Tables.load(spark, sf0001, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // single micro-batch → one emitted row per user with final counts
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotMap === want)
  }

  test("incremental foreachBatch sink appends per micro-batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graftstream")
    val stream = EventStreams.readEventsStream(spark, sf0001)
    val q = EventStreams.writeIncremental(
      stream.select("event_id", "user_id", "value"),
      s"$tmp/out", s"$tmp/ckpt")
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(s"$tmp/out").count() ===
      Tables.load(spark, sf0001, "events").count())
  }

  test("q51 lag-sessionization and q52 session_window agree on sessions") {
    val lag = graft.operators.Sessionize.queries("q51_sessionize_lag")(spark, sf0001)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .orderBy("user_id", "session_start").collect()
    val sw = graft.operators.Sessionize.queries("q52_session_window")(spark, sf0001)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .orderBy("user_id", "session_start").collect()
    assert(lag.sameElements(sw))
  }
}

class IncrementalStreamSpec extends SparkSpec {
  test("second file arriving produces a second micro-batch append") {
    val tmp = java.nio.file.Files.createTempDirectory("graftinc")
    val watch = tmp.resolve("in"); java.nio.file.Files.createDirectories(watch)
    // batch 1: copy events.parquet in
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      watch.resolve("events.parquet"))
    val stream = spark.readStream
      .schema(graft.streaming.EventStreams.rawSchema)
      .parquet(watch.toString)
      .selectExpr("event_id", "user_id", "value")
    val q = graft.streaming.EventStreams.writeIncremental(
      stream, s"$tmp/out", s"$tmp/ckpt")
    q.processAllAvailable()
    val n1 = spark.read.parquet(s"$tmp/out").count()
    // batch 2: a second file appears (same rows, new name)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      watch.resolve("events2.parquet"))
    q.processAllAvailable()
    q.stop()
    val n2 = spark.read.parquet(s"$tmp/out").count()
    assert(n1 === 1000 && n2 === 2000)
  }
}

/** Stream-static join: the streaming events enriched against a
  * static dimension — the standard shape for joining a stream with
  * reference data (the static side is re-read per micro-batch;
  * broadcast when small). */
class StreamStaticJoinSpec extends SparkSpec {
  test("streaming events join a static user dimension; counts match batch") {
    import org.apache.spark.sql.functions._
    val users = spark.range(0, 50).select(
      col("id").as("user_id"),
      concat(lit("tier_"), pmod(col("id"), lit(3))).as("tier"))
    val stream = graft.streaming.EventStreams.readEventsStream(spark, sf0001)
      .join(broadcast(users), Seq("user_id"))
      .groupBy("tier").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("t_ss").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_ss").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.load(spark, sf0001, "events")
      .join(users, Seq("user_id"))
      .groupBy("tier").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want && got.nonEmpty)
  }
}

/** Streaming deduplication: dropDuplicates keyed on event_id with a
  * watermark bounding the dedup state. */
class StreamingDedupSpec extends SparkSpec {

  test("sketch-based streaming near-dup: simhash-keyed dropDuplicates == batch sketch dedup") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // documents arriving as micro-batches; near-dups (same simhash
    // fingerprint) must be emitted once across batch boundaries —
    // the streaming form of the q46 sketch keyed by the SAME codegen
    // expression, so stream and batch agree by construction
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val tmp = java.nio.file.Files.createTempDirectory("graftsndup")
    val watch = tmp.resolve("in"); java.nio.file.Files.createDirectories(watch)
    docs.limit(200).coalesce(1).write.parquet(watch.resolve("b0").toString)
    val fp = graft.functions.SimHash.simhash64(
      graft.functions.Text.tokens(col("text")))
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watch.toString + "/*")
      .withColumn("fp", fp)
      .dropDuplicates("fp")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("t_ndup").start()
    q.processAllAvailable()
    // second batch: the same 200 docs again plus 100 new ones —
    // every re-arrival shares a fingerprint and must be suppressed
    docs.limit(300).coalesce(1).write.mode("append")
      .parquet(watch.resolve("b1").toString)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_ndup").select("fp")
      .collect().map(_.getLong(0)).sorted
    val batch = docs.limit(300).select(fp.as("fp")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(streamed.length === streamed.distinct.length, "stream emitted a fp twice")
    assert(streamed.toSet === batch.toSet,
      "streaming sketch dedup diverged from batch sketch dedup")
  }

  test("duplicate events across micro-batches are emitted once") {
    val tmp = java.nio.file.Files.createTempDirectory("graftsdedup")
    val watch = tmp.resolve("in"); java.nio.file.Files.createDirectories(watch)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      watch.resolve("events.parquet"))
    val stream = graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(graft.streaming.EventStreams.rawSchema)
        .parquet(watch.toString))
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("t_dedup").start()
    q.processAllAvailable()
    // the same file again: every event is a duplicate
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      watch.resolve("events_dup.parquet"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("t_dedup").count() === 1000)
  }

  test("readEventsStream probes the on-disk ts dtype: nanos-long generation round-trips") {
    // simulate the TIMESTAMP(NANOS) corpus generation: with
    // nanosAsLong set those files arrive as raw epoch-nanos longs, so
    // a plain long ts column exercises the identical reader path — the
    // streaming schema must adapt instead of hard-pinning NTZ
    val tmp = java.nio.file.Files.createTempDirectory("graftnanosgen")
    val watch = tmp.resolve("in"); java.nio.file.Files.createDirectories(watch)
    val batch = Tables.loadEvents(spark, sf0001)
    val stageDir = tmp.resolve("stage").toString
    batch.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(stageDir)
    val part = new java.io.File(stageDir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, watch.resolve("events.parquet"))
    val stream = EventStreams.readEventsStream(spark, watch.toString)
    assert(stream.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val q = stream.select("event_id", "ts").writeStream
      .outputMode("append").format("memory").queryName("t_nanosgen").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_nanosgen")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val want = batch.select("event_id", "ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(got === want, "nanos-long streaming generation diverged from batch")
  }

  test("stream-stream interval join equals the batch range join") {
    // split the events corpus into two deterministic halves — the
    // "click" stream (odd event_id) and the "view" stream (even) —
    // and join each click to the same user's views in the prior 30
    // minutes, streamed vs batch
    val batch = Tables.loadEvents(spark, sf0001)
    val clicksB = batch.filter(col("event_id") % 2 === 1)
    val viewsB = batch.filter(col("event_id") % 2 === 0)
    val clicksS = EventStreams.readEventsStream(spark, sf0001)
      .filter(col("event_id") % 2 === 1)
    val viewsS = EventStreams.readEventsStream(spark, sf0001)
      .filter(col("event_id") % 2 === 0)
    val q = EventStreams.intervalJoin(clicksS, viewsS)
      .writeStream.outputMode("append").format("memory")
      .queryName("t_ssjoin").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_ssjoin")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val want = EventStreams.intervalJoin(clicksB, viewsB)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === want, "stream-stream join diverged from batch")
    assert(want.nonEmpty, "corpus should contain joinable click/view pairs")
  }

  test("normalizeEventTs rejects an unknown ts dtype loudly") {
    import spark.implicits._
    val bogus = Seq((1L, "2026-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Tables.normalizeEventTs(bogus))
    assert(e.getMessage.contains("unsupported dtype"))
  }
}
