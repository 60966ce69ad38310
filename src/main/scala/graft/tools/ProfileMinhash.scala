package graft.tools
import org.apache.spark.sql.functions._
object ProfileMinhash {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"PROFILE $label%-18s ${(System.nanoTime - t0) / 1e9}%8.2f s  ($n rows)")
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, 32)
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    import graft.text.Dedup._
    val shingled = df.select(col("doc_id"), wordNgrams(col("text"), 3).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("shingle+persist") { shingled.count() }
    val sigs = minhashSignatures(shingled, "doc_id", 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("signatures") { sigs.count() }
    val pairs = lshCandidatePairs(sigs, "doc_id", "sig", 16, 4)
    t("candidate pairs") { pairs.count() }
    val sa = shingled.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    t("verify join") {
      pairs.join(sa, "id_a").join(sb, "id_b")
        .select(col("id_a"), col("id_b"),
          round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5).count()
    }
    spark.stop()
  }
}
