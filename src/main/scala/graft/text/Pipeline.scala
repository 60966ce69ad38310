package graft.text

import org.apache.spark.sql.DataFrame

/** Restartable multi-stage pipeline runner — the front door for
  * composing the crawl/curation stages ([[Html.dropBoilerplate]] →
  * [[TextAnalysis]] filters → [[Dedup.standardPipeline]] → …) into ONE
  * production job.
  *
  * Each stage materializes to parquet under `workDir/<NN>_<name>` and
  * the next stage reads that output. Two reasons this is the right
  * shape (measured, r16 — see BASELINE.md "pipeline scale stamp"):
  * composing many HOF-heavy stages into one Catalyst tree blows up
  * OPTIMIZATION itself (CollapseProject substitutes the extraction
  * regex battery into every downstream consumer — the driver spun
  * minutes before a task ran), and the materialized handoff is what
  * makes a multi-hour 100 TB run RESTARTABLE.
  *
  * Resume: a stage directory carrying `_SUCCESS` (written by Spark's
  * own output committer) is complete and is NOT recomputed — the run
  * resumes at the first incomplete stage, and every stage after a
  * recomputed one is invalidated in cascade (its input changed, so a
  * stale `_SUCCESS` downstream must not short-circuit it). A crashed
  * write leaves no marker and rebuilds. The resume key is the stage's
  * (position, name): editing a stage's LOGIC without renaming it
  * requires deleting its directory — checkpoint semantics, the caller
  * owns invalidation.
  *
  * `fanOut > 0` repartitions the input and every stage output: small
  * single-file intermediates otherwise collapse narrow per-row stages
  * to parallelism ONE (one parquet row group = one read task — the
  * filter stage ran 198 s at sf1 and 20x super-linear before this; a
  * many-file TB-scale stage output on a real cluster gets the same
  * balance from the scan, so 0 = off is the cluster default). */
object Pipeline {

  def run(input: DataFrame,
          stages: Seq[(String, DataFrame => DataFrame)],
          workDir: String,
          fanOut: Int = 0): DataFrame = {
    require(stages.nonEmpty, "Pipeline.run: no stages")
    val names = stages.map(_._1)
    require(names.distinct.size == names.size,
      s"Pipeline.run: duplicate stage names: ${names.mkString(", ")} — " +
        "the resume key is (position, name)")
    val spark = input.sparkSession
    val root = new org.apache.hadoop.fs.Path(workDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fanned(df: DataFrame) =
      if (fanOut > 0) df.repartition(fanOut) else df
    var cur = fanned(input)
    var dirty = false
    for (((name, f), k) <- stages.zipWithIndex) {
      val dir = new org.apache.hadoop.fs.Path(root, f"$k%02d_$name")
      val marker = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
      if (dirty || !fs.exists(marker)) {
        // invalidation cascades: this stage's input changed (or was
        // never completed), so recompute even under a stale marker
        fanned(f(cur)).write.mode("overwrite").parquet(dir.toString)
        dirty = true
      }
      cur = spark.read.parquet(dir.toString)
    }
    cur
  }
}
