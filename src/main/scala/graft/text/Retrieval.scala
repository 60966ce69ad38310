package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Sparse-lexical retrieval over a document corpus — the BM25 ranking
  * function (Robertson/Sparck-Jones, the standard TF-IDF-family scorer)
  * as a relational Spark pipeline. A training-data curator uses this to
  * pull topical slices out of a web corpus ("quality pearls near seed
  * queries", targeted eval-set mining) without an external search engine.
  *
  * Shape at 100 TB:
  *  - document length is computed scan-side from the token array — it
  *    never shuffles;
  *  - the ONLY corpus-sized shuffle is the (doc, term) partial-agg that
  *    builds term frequencies, and it is pruned to the query vocabulary
  *    BEFORE the shuffle: the broadcast query-term semi-join sits between
  *    the explode and the aggregation, so a 3-term query aggregates only
  *    the postings of 3 terms, not the whole corpus vocabulary;
  *  - df(term) and the corpus stats (N, avgdl) are tiny aggregates that
  *    broadcast back; per-query fan-out is a broadcast join;
  *  - the final per-query top-k is a row_number window, which Spark
  *    executes as a partial top-k per partition (WindowGroupLimit) —
  *    never a full sort of the scored set.
  *
  * Scores are deterministic across engines: ranking uses round(score, 6)
  * with a doc-id tiebreak, so summation-order ulp noise cannot flip ranks.
  */
object Retrieval {

  /** BM25 top-k per query. Output: (query_id, doc_id, rank, score). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, qtextCol: String,
               topK: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // the tokenized corpus feeds TWO consumers — the query-term match
    // (explode below) and the corpus stats aggregate (N, avgdl) —
    // and unpersisted each ran the regex tokenization over the whole
    // corpus from scratch (r18, the q43 two-consumers audit pattern);
    // persist (tracked) so the corpus tokenizes once per call
    val toks = graft.GraftSession.trackPersist(
      docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(lower(col(textCol))).as("toks"))
      // null text → null dl (avg skips it, the SQL mirror) — raw
      // size(null) is -1 with ANSI off and would silently drag avgdl
      // down for every real document
      .withColumn("dl", when(col("toks").isNotNull,
        size(col("toks")).cast(DoubleType))))

    val qterms = queries.select(col(qidCol).cast(LongType).as("query_id"),
      explode(array_distinct(TextAnalysis.tokens(lower(col(qtextCol)))))
        .as("term"))
    val qtermSet = qterms.select("term").distinct()

    // prune to query vocabulary BEFORE the (doc, term) shuffle
    val matched = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(qtermSet), Seq("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast(DoubleType).as("tf"), max(col("dl")).as("dl"))

    // (doc, term) is unique after the agg, so count(*) = document frequency
    val dfs = matched.groupBy("term")
      .agg(count(lit(1)).cast(DoubleType).as("df"))
    val stats = toks.agg(count(lit(1)).cast(DoubleType).as("n_docs"),
      avg(col("dl")).as("avgdl"))

    val scored = matched
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("contrib")), 6).as("score"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }
}
