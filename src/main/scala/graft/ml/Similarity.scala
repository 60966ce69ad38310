package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a single codegen'd scan with a
  * `TakeOrderedAndProject` at the end (no shuffle of the vectors
  * themselves, only of the per-partition top-k rows).
  *
  * Scale path: random-hyperplane LSH bucketing — each vector maps to a
  * small bit-bucket; a query probes only its own bucket, so a 100 TB
  * corpus reads one bucket's partitions instead of everything
  * (bucket column is a perfect partition/cluster key for the sink).
  */
object Similarity {

  /** Σ aᵢ·bᵢ in index order (deterministic double accumulation).
    * HOF reference form; the hot path uses the codegen'd
    * [[graft.functions.VectorExpressions.dot_product]] (bit-identical —
    * same accumulation order). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** HOF reference form of cosine; kept for differential testing. */
  def cosineHof(a: Column, b: Column): Column = {
    def normH(x: Column) = sqrt(dotHof(x, x))
    when(normH(a) > 0 && normH(b) > 0,
      dotHof(a, b) / (normH(a) * normH(b))).otherwise(lit(0.0))
  }

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine_sim(a, b)

  /** Brute-force cosine top-k against one query vector. The query vector is
    * a literal (broadcast by value into the codegen'd plan). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = typedlit(query)
    emb.select(col(idCol), round(cosine(col(vecCol), q), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component: ±1 derived from a
    * bit-mix of (plane, dim) — no RNG state, same plane on every executor. */
  private def planeComponent(plane: Int, dim: Column): Column =
    when(pmod(hash(lit(plane), dim), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Signed projection of a vector onto pseudo-random hyperplane `p`. */
  private def projectionSign(vec: Column, plane: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast(DoubleType) * planeComponent(plane, i)),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** LSH bucket id from `numPlanes` sign bits (2^numPlanes buckets). */
  def lshBucket(vec: Column, numPlanes: Int): Column =
    (0 until numPlanes).map(p =>
      shiftleft(projectionSign(vec, p), p)).reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k: probe only the query's LSH bucket, then exact cosine rank
    * within it. Approximate — recall depends on numPlanes; the same
    * signature logic computed once over the corpus can be persisted as a
    * bucket-partitioned table for repeated queries. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, numPlanes: Int = 4): DataFrame = {
    val q = typedlit(query)
    val bucketed = emb.withColumn("bucket", lshBucket(col(vecCol), numPlanes))
    val queryBucket = lshBucket(q, numPlanes)
    bucketed.filter(col("bucket") === queryBucket)
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs near neighbors above a cosine threshold, LSH-bucketed so
    * only same-bucket pairs are compared (never a global cross join). */
  def nearNeighborPairs(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, numPlanes: Int = 4): DataFrame = {
    val bucketed = emb.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), numPlanes).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("vec_a"), col("vec_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
