package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Structured Streaming surface: drive each helper with a MemoryStream and
  * assert on the memory sink — synchronous via processAllAvailable. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }

  test("parquet sink: exactly-once file output; foreachBatch sees ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    input.addData((1L, "a"), (2L, "b"), (3L, "c"))
    val base = java.nio.file.Files.createTempDirectory("sink")
    val q = Streams.writeParquetStream(input.toDF().toDF("id", "v"),
      s"$base/out", s"$base/ckpt")
    q.awaitTermination()
    assert(spark.read.parquet(s"$base/out").count() == 3)
    // restart on the SAME checkpoint with no new data: nothing re-emitted
    val q2 = Streams.writeParquetStream(input.toDF().toDF("id", "v"),
      s"$base/out", s"$base/ckpt")
    q2.awaitTermination()
    assert(spark.read.parquet(s"$base/out").count() == 3)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input2 = MemoryStream[Long]
    input2.addData(1L, 2L)
    val q3 = Streams.foreachBatchSink(input2.toDF(),
      s"$base/ckpt2", (b, id) => seen.synchronized { seen += ((id, b.count())) })
    q3.awaitTermination()
    assert(seen.map(_._2).sum == 2)
  }

  test("tumbling window counts with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    input.addData(
      (ts("2024-01-01 00:01:00"), "click", 1.0),
      (ts("2024-01-01 00:02:00"), "click", 2.0),
      (ts("2024-01-01 01:01:00"), "view", 3.0))
    val agg = Streams.tumblingCounts(
      input.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", "1 hour", "10 minutes")
    runToMemory(agg, "tumb", "update")
    val rows = spark.sql("SELECT event_type, n, sum_value FROM tumb").collect()
    val m = rows.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("click") == (2L, 3.0) && m("view") == (1L, 3.0))
  }

  test("session window groups by gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    input.addData(
      (ts("2024-01-01 00:00:00"), 1L, 0.0),
      (ts("2024-01-01 00:04:00"), 1L, 0.0),   // same session (gap 4m < 5m)
      (ts("2024-01-01 02:00:00"), 1L, 0.0))   // new session
    val agg = Streams.sessionCounts(
      input.toDF().toDF("ts", "user_id", "value"),
      "ts", "user_id", "5 minutes", "10 minutes")
    runToMemory(agg, "sess", "complete")
    val ns = spark.sql("SELECT count(*) FROM sess").head().getLong(0)
    assert(ns == 2L)
  }

  test("dedup within watermark drops re-deliveries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    input.addData(
      (ts("2024-01-01 00:00:00"), 100L),
      (ts("2024-01-01 00:00:30"), 100L),  // duplicate event_id
      (ts("2024-01-01 00:01:00"), 101L))
    val dd = Streams.dedupWithinWatermark(
      input.toDF().toDF("ts", "event_id"), "ts", "1 hour", "event_id")
    runToMemory(dd, "dd", "append")
    assert(spark.sql("SELECT count(*) FROM dd").head().getLong(0) == 2L)
  }

  test("flatMapGroupsWithState: running per-user stats across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Streams.KeyEvent]
    val q = Streams.runningUserStats(input.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("stats").start()
    input.addData(Streams.KeyEvent(1L, 2.0), Streams.KeyEvent(1L, 3.0))
    q.processAllAvailable()
    input.addData(Streams.KeyEvent(1L, 5.0), Streams.KeyEvent(2L, 7.0))
    q.processAllAvailable()
    q.stop()
    // state carried across micro-batches: user 1 accumulated 3 events
    val rows = spark.sql(
      "SELECT user_id, max(n) n, max(total) t FROM stats GROUP BY user_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(1L) == (3L, 10.0))
    assert(rows(2L) == (1L, 7.0))
  }

  test("stream-static enrichment broadcasts the dim per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    input.addData((1L, 5.0), (2L, 7.0), (9L, 1.0))
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val out = Streams.enrichWithStatic(
      input.toDF().toDF("user_id", "value"), dim, Seq("user_id"))
    runToMemory(out, "enriched", "append")
    val rows = spark.sql("SELECT user_id, tier FROM enriched").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "gold", 2L -> "silver")) // 9L has no dim row
  }

  test("stream-stream interval join buffers only within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(java.sql.Timestamp, Long)]
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    imps.addData(
      (ts("2024-01-01 00:00:00"), 1L),
      (ts("2024-01-01 00:00:00"), 2L))
    clicks.addData(
      (ts("2024-01-01 00:05:00"), 1L),   // within 10 min of imp 1 → joins
      (ts("2024-01-01 00:30:00"), 2L),   // 30 min later → outside interval
      (ts("2024-01-01 00:02:00"), 3L))   // no matching impression
    val joined = Streams.intervalJoin(
      imps.toDF().toDF("imp_ts", "ad_id"), "imp_ts",
      clicks.toDF().toDF("click_ts", "ad_id"), "click_ts",
      Seq("ad_id"), within = "10 minutes", watermark = "1 minute")
    runToMemory(joined.select(col("imp_ts"), col("click_ts")), "ivj", "append")
    val got = spark.sql("SELECT imp_ts, click_ts FROM ivj").collect()
    assert(got.length == 1)
    assert(got(0).getTimestamp(0) == ts("2024-01-01 00:00:00"))
    assert(got(0).getTimestamp(1) == ts("2024-01-01 00:05:00"))
  }

  test("batch pipeline re-points to a stream unchanged (readStream twin)") {
    // same groupBy(window) code works on a file stream of the events table
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // file streams need a directory source — stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = Streams.readParquetStream(spark, dir.toString, schema)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = Streams.tumblingCounts(stream, "ts", "event_type",
      "1 hour", "1 minute")
    runToMemory(agg, "filetwin", "update")
    val n = spark.sql("SELECT sum(n) FROM filetwin").head().getLong(0)
    assert(n == sf("events").count())
  }

  test("curation signals run unchanged on a stream (pure-Column ops: " +
       "langId/quality/gopher/fingerprint at ingest)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.text.TextAnalysis
    val input = MemoryStream[(Long, String)]
    input.addData(
      (1L, "the quick brown fox jumps over the lazy dog and that is it"),
      (2L, "der hund ist nicht mit der katze und das ist gut"),
      (3L, ""))
    val curated = input.toDF().toDF("doc_id", "text").select(
      col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.gopherFlags(col("text")).getField("keep").as("keep"))
    runToMemory(curated, "curated_stream", "append")
    val rows = spark.sql("SELECT * FROM curated_stream ORDER BY doc_id")
      .collect()
    assert(rows.length == 3)
    assert(rows(0).getString(1) == "en" && rows(1).getString(1) == "de")
    // batch twin: identical values row-for-row (operators are the same
    // Column expressions, so streaming == batch by construction — this
    // pins that no op silently requires a batch-only feature)
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and that is it"),
      (2L, "der hund ist nicht mit der katze und das ist gut"),
      (3L, "")).toDF("doc_id", "text").select(
      col("doc_id"), TextAnalysis.langId(col("text")),
      TextAnalysis.qualityScore(col("text")),
      TextAnalysis.fingerprint(col("text")),
      TextAnalysis.gopherFlags(col("text")).getField("keep"))
      .orderBy("doc_id").collect()
    assert(rows.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }
}
