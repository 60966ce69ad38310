package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Decode
import graft.streaming.StreamingMediaDedup
import graft.text.SigIndex

/** Continuous media ingest (r17): fingerprint → in-batch multiProbe
  * dedup → SigIndex filter → append, with the StreamingDedup
  * exactly-once contract on signatures. */
class StreamingMediaDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def imgBatch(rows: (Long, Array[Byte])*) = {
    val df = rows.toSeq.toDF("img_id", "payload")
    Decode.imageSignatures(df, "img_id", "payload").toDF()
      .select(col("img_id"), col("dhash").as("sig"))
  }

  test("media ingest: in-batch twins collapse, an indexed twin is " +
       "caught, novel + undecodable survive; committed and " +
       "crash-window replays are idempotent") {
    // seed index: images 1..5
    SigIndex.write(imgBatch((1L to 5L).map(i =>
      i -> Decode.encodePatternPng(i, 2)): _*),
      "img_id", "sig", "smd_ix")
    val out = tmp("smdout")
    // batch: 10 = jpeg twin of indexed 3 (caught); 11 + 12 = in-batch
    // jpeg twins of each other (one survives); 13 = novel; 14 = corrupt
    val b = imgBatch(
      10L -> Decode.reencodeJpeg(Decode.encodePatternPng(3L, 2)).get,
      11L -> Decode.encodePatternPng(777L, 2),
      12L -> Decode.reencodeJpeg(Decode.encodePatternPng(777L, 2)).get,
      13L -> Decode.encodePatternPng(888L, 2),
      14L -> Decode.encodePatternPng(888L, 2).take(16))
    StreamingMediaDedup.ingestBatch(b, 0L, "img_id", "sig",
      "smd_ix", out)
    def survivorsOf(batch: Long) =
      spark.read.parquet(s"$out/ingest_batch=$batch")
        .select("img_id").as[Long].collect().toSet
    val s0 = survivorsOf(0L)
    assert(s0.contains(13L), "the novel image must survive")
    assert(s0.contains(14L),
      "the undecodable payload must survive (null sig reports " +
        "upstream, never silently dropped)")
    assert(!s0.contains(10L), "the indexed twin must be caught")
    assert((s0 & Set(11L, 12L)).size == 1,
      s"exactly one of the in-batch twins survives, got $s0")
    // committed replay: the ingest log short-circuits — index unchanged
    val nSigs = spark.table("smd_ix_sigs").count()
    StreamingMediaDedup.ingestBatch(b, 0L, "img_id", "sig",
      "smd_ix", out)
    assert(spark.table("smd_ix_sigs").count() == nSigs)
    assert(survivorsOf(0L) == s0)
    // crash window: append happened, the log write didn't — replay
    // re-derives the SAME survivors (self-exclusion, and the in-batch
    // multiProbe guarantee keeps survivors pairwise > maxDistance)
    spark.sql("DROP TABLE smd_ix_ingestlog")
    StreamingMediaDedup.ingestBatch(b, 0L, "img_id", "sig",
      "smd_ix", out)
    assert(survivorsOf(0L) == s0)
    // next batch: a twin of a PREVIOUS survivor is now caught
    val b2 = imgBatch(
      20L -> Decode.reencodeJpeg(Decode.encodePatternPng(888L, 2)).get,
      21L -> Decode.encodePatternPng(999L, 2))
    StreamingMediaDedup.ingestBatch(b2, 1L, "img_id", "sig",
      "smd_ix", out)
    assert(survivorsOf(1L) == Set(21L),
      "the twin of batch 0's survivor must be caught by the index")
    assert(StreamingMediaDedup.survivors(spark, out)
      .count() == s0.size + 1)
  }

  test("streaming end-to-end: file-source micro-batches drive the " +
       "media ingest through the sign hook; a restart on the same " +
       "checkpoint re-processes nothing") {
    SigIndex.write(imgBatch(1L -> Decode.encodePatternPng(50L, 2)),
      "img_id", "sig", "smd_ix2")
    val in = tmp("smdin"); val out = tmp("smdout2"); val cp = tmp("smdcp")
    val mk = udf((seed: Long) => Decode.encodePatternPng(seed, 2))
    Seq((101L, 50L), (102L, 60L)).toDF("img_id", "seed")
      .select(col("img_id"), mk(col("seed")).as("payload"))
      .write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def run(): Unit = StreamingMediaDedup.ingest(
      spark.readStream.schema(schema).parquet(in),
      "img_id", "sig",
      b => Decode.imageSignatures(b, "img_id", "payload").toDF()
        .select(col("img_id"), col("dhash").as("sig")),
      "smd_ix2", out, cp).awaitTermination()
    run()
    assert(StreamingMediaDedup.survivors(spark, out)
      .select("img_id").as[Long].collect().toSet == Set(102L),
      "101 duplicates the indexed image (same seed) and must be caught")
    val logN = spark.table("smd_ix2_ingestlog").count()
    run() // nothing new on the same checkpoint
    assert(spark.table("smd_ix2_ingestlog").count() == logN)
  }
}
