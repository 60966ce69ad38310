package graft.tools

/** A/B microbench: banded simhash near-dups with and without the
  * bit-flip multi-probe recall lever (BASELINE.md cost note). The
  * multi-probe runs raise maxBucket 17× to match the 17× bucket
  * population growth, keeping the cap semantics comparable. */
object TimeSimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (mp <- Seq(false, true, false, true, false, true)) {
      val t0 = System.nanoTime()
      val sigs = graft.text.Dedup.simhash(docs, "doc_id", "text")
      val n = graft.text.Dedup.simhashNearDups(sigs, "doc_id",
        maxDistance = 8, maxBucket = if (mp) 17000 else 1000,
        multiProbe = mp).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.GraftSession.unpersistAll()
      println(f"[time] simhashNearDups multiProbe=$mp%-5s $dt%8.3f s  pairs=$n")
    }
    spark.stop()
  }
}
