package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.GraftExpressions.poly_hash

/** Deterministic, shuffle-free corpus splitting and sampling for
  * training-data pipelines (SURVEY.md §2.8).
  *
  * Both operators key on the cross-engine rolling hash of a stable
  * column rather than `rand()`: the assignment is (a) reproducible
  * across runs/engines, (b) a pure scan-side projection — at 100 TB it
  * fuses into whole-stage codegen with zero shuffle and zero driver
  * state, and (c) stable under repartitioning, unlike `rand(seed)`
  * which is partition-index-dependent.
  */
object Sampling {

  /** hash-bucket in [0, 100) from a stable key column. */
  def pctBucket(key: Column): Column = poly_hash(key.cast("string")) % 100

  /** Deterministic train/val/test assignment: bucket < trainPct →
    * "train", < trainPct+valPct → "val", else "test". Appends
    * `bucket` + `split`.
    */
  def hashSplit(df: DataFrame, key: Column,
                trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.withColumn("bucket", pctBucket(key))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))

  /** Stratified downsampling: per-stratum keep-percentage, applied as
    * a hash predicate on the content column. `rates` maps stratum
    * value → keep percent; strata not listed keep `defaultPct`.
    * Classic use: downsample the dominant language to rebalance.
    */
  def stratified(df: DataFrame, stratum: Column, content: Column,
                 rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val keepPct = rates.foldLeft(lit(defaultPct)) { case (acc, (k, pct)) =>
      when(stratum === k, lit(pct)).otherwise(acc)
    }
    df.where(pctBucket(content) < keepPct)
  }
}
