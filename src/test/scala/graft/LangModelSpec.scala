package graft

import org.apache.spark.sql.functions._

/** Bigram-LM quality scoring ([[graft.text.LangModel]]). */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("perplexityBuckets: equal-size per-stratum split by rounded " +
       "score, unscoreable docs keep null buckets") {
    // 6 scoreable docs per lang with increasingly repetitive (= more
    // predictable = lower nll) content, plus one 1-token doc
    val docs = (for {
      lang <- Seq("en", "de"); i <- 0 until 6
    } yield {
      val rep = Seq.fill(6 - i)("common words here").mkString(" ")
      val rare = (0 until i).map(j => s"rare$lang$i$j").mkString(" ")
      (lang.hashCode.toLong * 100 + i, lang, s"$rep $rare")
    }).toDF("doc_id", "lang", "text")
      .union(Seq((999L, "en", "solo")).toDF("doc_id", "lang", "text"))
    val out = graft.text.LangModel.perplexityBuckets(
      docs, "doc_id", "text", stratumCol = Some("lang"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val rows = out.collect()
    assert(rows.length == 13)
    val solo = rows.find(_.getLong(0) == 999L).get
    assert(solo.getLong(1) == 0L && solo.isNullAt(2) && solo.isNullAt(3))
    // per lang: 6 scored docs -> buckets 1,1,2,2,3,3
    for (lang <- Seq("en", "de")) {
      val bs = rows.filter(r => r.getString(4) == lang && !r.isNullAt(3))
        .map(_.getLong(3)).sorted.toSeq
      assert(bs == Seq(1L, 1L, 2L, 2L, 3L, 3L), s"$lang: $bs")
    }
    // determinism across runs
    val again = graft.text.LangModel.perplexityBuckets(
      docs, "doc_id", "text", stratumCol = Some("lang"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) -1L
        else r.getLong(3))).toSet
    assert(again == rows.map(r => (r.getLong(0), if (r.isNullAt(3)) -1L
      else r.getLong(3))).toSet)
  }

  private def docs = Seq(
    (0L, "a b a b"), (1L, "a b"), (2L, "c"), (3L, "")).toDF("doc_id", "text")

  test("ngramScore at n=3: hand-computed trigram add-1 scores; n=2 " +
       "equals bigramScore value-for-value") {
    val d3 = Seq(
      (0L, "a b c a b c"), (1L, "a b c"), (2L, "x y"), (3L, ""))
      .toDF("doc_id", "text")
    // unigrams: a=3 b=3 c=3 x=1 y=1 → V=5
    // bigram contexts (all positions): "a b"=3, "b c"=3, "c a"=1, "x y"=1
    // trigrams: "a b c"=3, "b c a"=1, "c a b"=1
    val nABC = -math.log(4.0 / 8.0)  // (3+1)/(C("a b")=3 + 5)
    val nBCA = -math.log(2.0 / 8.0)  // (1+1)/(C("b c")=3 + 5)
    val nCAB = -math.log(2.0 / 6.0)  // (1+1)/(C("c a")=1 + 5)
    val out = graft.text.LangModel.ngramScore(d3, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4L)
    assert(math.abs(out(0).getDouble(2) -
      math.rint((nABC * 2 + nBCA + nCAB) / 4 * 1e6) / 1e6) < 1e-9)
    assert(out(1).getLong(1) == 1L &&
      math.abs(out(1).getDouble(2) - math.rint(nABC * 1e6) / 1e6) < 1e-9)
    // < 3 tokens → 0 grams, null score
    assert(out(2).getLong(1) == 0L && out(2).isNullAt(2))
    assert(out(3).getLong(1) == 0L && out(3).isNullAt(2))
    // n=2 through the generic path == the historical bigramScore
    val a = graft.text.LangModel.bigramScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    val b = graft.text.LangModel.ngramScore(docs, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(a.toSeq == b.toSeq)
  }

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
