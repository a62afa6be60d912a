package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan parallelism (optimization guide §2.5/§6).
  *
  * A parquet scan's task count is its split count, and a split cannot
  * divide a row group — so a small input (one file, one row group)
  * yields a ONE-task scan stage no matter how many cores the session
  * has. For byte-light but compute-dense scans (vector dot-product
  * folds, hashed featurization, shingle/char-gram hashing, banded DP)
  * that serializes the dominant cost of the query on one core.
  *
  * [[fanout]] round-robin repartitions a frame to the session's default
  * parallelism ONLY when its planned partition count is below it: at
  * real corpus scale the scan already yields >= cores splits and the
  * call is an identity — no exchange is added, nothing is tuned to
  * local mode. At bench scale it costs one exchange of a tiny frame
  * (the inputs here are < a few MB) and buys full-width compute.
  *
  * Only used on frames whose consumers are row-order independent
  * (exact-arithmetic aggregates, keyed windows with total orderings) —
  * which is every oracle-checked query by construction, since the
  * driver's hash compare is over sorted rows and AQE already varies
  * partitioning run to run.
  */
object Par {
  def fanout(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // repartition alone re-runs scan+exchange at EVERY reference to the
    // frame (a multi-leg eval references its base table ~20 times:
    // measured +3.3 s on emb_ann_recall from exactly that); the lazy
    // localCheckpoint materializes the fanned partitions once inside
    // the first consumer's job and every later reference reads the
    // cached partitions. Per-query, inside the timed region — nothing
    // persists across runs.
    if (df.rdd.getNumPartitions < p) df.repartition(p).localCheckpoint(false)
    else df
  }
}
