package graft

import org.apache.spark.sql.functions._

/** Bigram-LM quality scoring ([[graft.text.LangModel]]). */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "a b a b"), (1L, "a b"), (2L, "c"), (3L, "")).toDF("doc_id", "text")

  test("bigram nll: hand-computed add-1 scores, self-trained") {
    val out = graft.text.LangModel.bigramScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // uni: a=3 b=3 c=1, V=3; bigrams: "a b"=3, "b a"=1
    val nAB = -math.log(4.0 / 6.0); val nBA = -math.log(2.0 / 6.0)
    assert(out(0).getLong(1) == 3L)
    assert(math.abs(out(0).getDouble(2) - (2 * nAB + nBA) / 3) < 1e-5)
    assert(out(1).getLong(1) == 1L)
    assert(math.abs(out(1).getDouble(2) - nAB) < 1e-5)
    // < 2 tokens → no bigrams, null score
    assert(out(2).getLong(1) == 0L && out(2).isNullAt(2))
    assert(out(3).getLong(1) == 0L && out(3).isNullAt(2))
  }

  test("scoring under a reference LM smooths unknown grams to count 0") {
    val unseen = Seq((5L, "x y")).toDF("doc_id", "text")
    val out = graft.text.LangModel
      .bigramScore(unseen, "doc_id", "text", train = Some(docs))
      .collect()
    // C(x y)=0, C(x)=0, V=3 → nll = -ln(1/3)
    assert(out.length == 1 && out(0).getLong(1) == 1L)
    assert(math.abs(out(0).getDouble(2) - math.log(3.0)) < 1e-5)
  }

  test("fluent text scores lower nll than shuffled gibberish") {
    val corpus = sf("documents")
    val scored = graft.text.LangModel
      .bigramScore(corpus, "doc_id", "text")
      .agg(avg("avg_nll")).head().getDouble(0)
    // scoring reversed-token docs under the real corpus LM must be worse
    val reversed = corpus.withColumn("text",
      array_join(reverse(split(col("text"), " ")), " "))
    val scoredRev = graft.text.LangModel
      .bigramScore(reversed, "doc_id", "text", train = Some(corpus))
      .agg(avg("avg_nll")).head().getDouble(0)
    assert(scoredRev > scored)
  }

  test("probe pins: null text scores null; repeated-token doc is finite") {
    val d = Seq((1L, "a b a"), (2L, null: String)).toDF("doc_id", "text")
    val out = graft.text.LangModel.bigramScore(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(1).getLong(1) == 0L && out(1).isNullAt(2))
    val rep = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val r = graft.text.LangModel.bigramScore(rep, "doc_id", "text").head()
    assert(r.getLong(1) == 3L && !r.isNullAt(2) && r.getDouble(2) > 0)
  }
}
