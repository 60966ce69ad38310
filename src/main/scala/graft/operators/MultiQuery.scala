package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import graft.dsl.Relation

/** Multi-store DAG planning — Pig's MultiQueryOptimizer equivalence
  * (reference: …/mapReduceLayer/MultiQueryOptimizer.java:75, PODemux;
  * SURVEY §4.3 #2). Spark executes each `write` as an independent action
  * and will RE-SCAN shared lineage per action unless told otherwise; Pig
  * merges sibling jobs sharing a scan into one job. The equivalence here:
  * persist every subplan consumed by more than one store, run the stores,
  * release.
  */
object MultiQuery {

  final case class Store(rel: Relation, path: String,
                         format: String = "parquet")

  /** Execute all stores, persisting the explicitly-shared subplans once.
    * `shared` lists the common ancestors (e.g. the SPLIT input or an
    * expensive join both branches read). Each is materialized on first
    * use and served from cache for the remaining actions. */
  def storeAll(shared: Seq[Relation], stores: Seq[Store]): Unit = {
    shared.foreach(_.df.persist(StorageLevel.MEMORY_AND_DISK))
    try stores.foreach { s =>
      s.rel.df.write.format(s.format).mode("overwrite").save(s.path)
    } finally shared.foreach(_.df.unpersist())
  }

  /** Convenience for the canonical SPLIT-then-store-branches shape. */
  def splitAndStore(input: Relation,
                    branches: Seq[(String, org.apache.spark.sql.Column, String)])
                   : Unit = {
    // Relation.split persists the input; write each branch then release.
    val parts = input.split(branches.map { case (n, c, _) => (n, c) }: _*)
    try branches.foreach { case (n, _, path) =>
      parts(n).df.write.mode("overwrite").parquet(path)
    } finally input.df.unpersist()
  }
}
