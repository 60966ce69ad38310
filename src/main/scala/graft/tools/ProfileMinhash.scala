package graft.tools
import org.apache.spark.sql.functions._

/** Perf triage for the MinHash near-dup pipeline: times each stage and
  * compares the two gram-formation strategies (window `lead` over the
  * exploded token stream vs per-row n-gram arrays) end-to-end. */
object ProfileMinhash {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"PROFILE $label%-22s ${(System.nanoTime - t0) / 1e9}%8.2f s  ($n rows)")
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, 32)
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .persist()
    df.count()
    import graft.text.Dedup._

    // end-to-end, current operator (window-lead gram stream)
    t("e2e lead-window") {
      val n = minhashNearDupsByWords(df, "doc_id", "text",
        n = 3, numHashes = 64, numBands = 16, threshold = 0.5).count()
      graft.GraftSession.unpersistAll(); n
    }
    t("e2e lead-window #2") {
      val n = minhashNearDupsByWords(df, "doc_id", "text",
        n = 3, numHashes = 64, numBands = 16, threshold = 0.5).count()
      graft.GraftSession.unpersistAll(); n
    }

    // stage times, HOF per-row gram arrays
    val shingled = df.select(col("doc_id"), wordNgrams(col("text"), 3).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("hof shingle+persist") { shingled.count() }
    val sigs = minhashSignatures(shingled, "doc_id", 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("hof signatures") { sigs.count() }
    val pairs = lshCandidatePairs(sigs, "doc_id", "sig", 16, 4)
    t("hof candidate pairs") { pairs.count() }
    val sa = shingled.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    t("hof verify join") {
      pairs.join(sa, "id_a").join(sb, "id_b")
        .select(col("id_a"), col("id_b"),
          round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5).count()
    }
    shingled.unpersist(); sigs.unpersist()

    // end-to-end, HOF variant via minhashNearDupsWith
    t("e2e hof") {
      val n = minhashNearDupsWith(df, "doc_id", "text",
        txt => wordNgrams(txt, 3), 64, 16, 0.5).count()
      graft.GraftSession.unpersistAll(); n
    }
    spark.stop()
  }
}
