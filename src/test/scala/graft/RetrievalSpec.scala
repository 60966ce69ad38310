package graft

import org.apache.spark.sql.functions._

/** BM25 retrieval ([[graft.text.Retrieval]]). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "red fish blue fish"),
    (1L, "red red red red"),
    (2L, "blue whale"),
    (3L, "green grass and green leaves"),
    (4L, "")).toDF("doc_id", "text")

  test("bm25: hand-computed score on a tiny corpus") {
    val qs = Seq((1L, "red")).toDF("query_id", "qtext")
    val out = graft.text.Retrieval
      .bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext", topK = 10)
      .orderBy("rank").collect()
    // N=5 docs, df(red)=2, idf = ln(1 + (5-2+0.5)/(2.5)) = ln(2.4)
    // dl: 4,4,2,5,0 → avgdl = 3.0
    val idf = math.log(2.4)
    def bm25(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    // doc1: tf=4 dl=4 beats doc0: tf=1 dl=4
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 0L))
    assert(math.abs(out(0).getDouble(3) - bm25(4, 4)) < 1e-5)
    assert(math.abs(out(1).getDouble(3) - bm25(1, 4)) < 1e-5)
  }

  test("bm25: multi-term scores sum per term; rarer term scores higher") {
    val qs = Seq((7L, "blue whale")).toDF("query_id", "qtext")
    val out = graft.text.Retrieval
      .bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext", topK = 10)
      .orderBy("rank").collect()
    // doc2 matches both terms (one of them df=1) → first; doc0 only 'blue'
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 0L))
    assert(out(0).getDouble(3) > out(1).getDouble(3))
  }

  test("bm25: topK truncates and ranks are dense per query") {
    val many = (0L until 40L).map(i => (i, "common term here")).toDF("doc_id", "text")
    val qs = Seq((1L, "common"), (2L, "absent")).toDF("query_id", "qtext")
    val out = graft.text.Retrieval
      .bm25TopK(many, "doc_id", "text", qs, "query_id", "qtext", topK = 5)
    val rows = out.collect()
    assert(rows.length == 5)                       // query 2 matches nothing
    assert(rows.forall(_.getLong(0) == 1L))
    // all-tied scores → doc_id tiebreak makes the cut deterministic
    assert(rows.map(_.getLong(1)).sorted.toSeq == (0L to 4L).toSeq)
  }

  test("bm25 plan: query-term prune is a broadcast join below the agg") {
    val qs = Seq((1L, "red")).toDF("query_id", "qtext")
    val plan = graft.text.Retrieval
      .bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("probe pins: empty/null query text and null-text docs") {
    val qs = Seq((1L, ""), (2L, null: String)).toDF("query_id", "qtext")
    assert(graft.text.Retrieval.bm25TopK(
      docs, "doc_id", "text", qs, "query_id", "qtext").count() == 0L)
    // null-text docs neither match nor poison the corpus stats
    val withNull = Seq((0L, "red fish"), (1L, null: String))
      .toDF("doc_id", "text")
    val q2 = Seq((1L, "red")).toDF("query_id", "qtext")
    val out = graft.text.Retrieval.bm25TopK(
      withNull, "doc_id", "text", q2, "query_id", "qtext").collect()
    assert(out.length == 1 && out(0).getLong(1) == 0L)
  }

  test("null-text docs are excluded from avgdl (review: size(null) = -1 " +
       "was dragging the normalization down)") {
    val withNull = Seq((0L, "red fish"), (1L, null: String))
      .toDF("doc_id", "text")
    val q = Seq((1L, "red")).toDF("query_id", "qtext")
    val score = graft.text.Retrieval
      .bm25TopK(withNull, "doc_id", "text", q, "query_id", "qtext")
      .head().getDouble(3)
    // N=2, df=1, avgdl must be 2.0 (the null doc skipped), dl=2
    val expected = math.log(1 + 1.5 / 1.5) * 2.2 / (1 + 1.2)
    assert(math.abs(score - expected) < 1e-5,
      s"score $score != $expected — avgdl poisoned?")
  }
}
