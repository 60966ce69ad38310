package graft.tools

import org.apache.spark.sql.functions._

/** Per-batch ingest cost against a growing index: the steady-state
  * number a continuous-ingest pipeline lives on. Builds the epoch
  * index over all docs except a fixed 500-doc batch, then times
  * [[graft.text.DedupIndex.dropDupsAgainst]] + `append` of that batch
  * (the exact [[graft.streaming.StreamingDedup.ingestBatch]] hot path,
  * minus the in-batch pass which is O(batch) trivially). The claim
  * under test: per-batch cost tracks the BATCH, not the corpus — in
  * particular the `_bucketcounts` maintenance merge-adds instead of
  * re-aggregating the fat `_buckets` table. */
object TimeIndexAppend {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val batch = docs.orderBy("doc_id").limit(500).localCheckpoint(true)
    val old = docs.join(batch.select("doc_id"), Seq("doc_id"), "left_anti")
    val t0 = System.nanoTime()
    graft.text.DedupIndex.write(old, "doc_id", "text", "tixapp")
    graft.GraftSession.unpersistAll()
    println(f"[time] epoch-write ${(System.nanoTime() - t0) / 1e9}%8.3f s " +
      s"(index docs = ${old.count()})")
    for (r <- 1 to 3) {
      val t1 = System.nanoTime()
      val survivors = graft.text.DedupIndex.dropDupsAgainst(
        batch, "doc_id", "text", "tixapp", threshold = 0.5,
        excludeSelfId = r > 1) // replays after the first append
      graft.text.DedupIndex.append(survivors, "doc_id", "text", "tixapp")
      val dt = (System.nanoTime() - t1) / 1e9
      graft.GraftSession.unpersistAll()
      println(f"[time] batch-filter+append run$r $dt%8.3f s")
    }
    spark.stop()
  }
}
