package graft.tools

/** A/B microbench for the DedupIndex epoch write (the once-per-epoch
  * cost; the persist-vs-recompute decision for its shared gram stream
  * is measured, not assumed — BASELINE.md discipline). */
object TimeIndexWrite {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the scan
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.text.DedupIndex.write(docs, "doc_id", "text", s"tix$r")
      val dt = (System.nanoTime() - t0) / 1e9
      graft.GraftSession.unpersistAll()
      println(f"[time] index-write run$r $dt%8.3f s")
    }
    spark.stop()
  }
}
