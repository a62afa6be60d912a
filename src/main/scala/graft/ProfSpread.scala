package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B harness for the r16 post-shuffle spread sites
  * ([[graft.operators.Par.spread]]): for each named query, runs the
  * spread (A) and byte-coalesced (B) variants alternately in one
  * session (warm both, then A B B A — drift-cancelling order) and
  * prints min seconds per variant. Same rationale as [[ProfAB]]: this
  * box's clock drifts up to ~4x WITHIN a run (canary_end evidence,
  * BENCH_DETAIL_r16_baseline), so only same-session alternating pairs
  * are trustworthy.
  */
object ProfSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, on: Boolean): Double = {
      graft.operators.Par.spreadEnabled = on
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-32s ${"spread_s"}%9s ${"coal_s"}%8s ${"delta"}%8s")
    names.foreach { n =>
      try {
        run(n, true); run(n, false) // warm both
        val a1 = run(n, true); val b1 = run(n, false)
        val b2 = run(n, false); val a2 = run(n, true)
        val (a, b) = (math.min(a1, a2), math.min(b1, b2))
        println(f"$n%-32s $a%9.3f $b%8.3f ${a - b}%+8.3f")
      } catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}") }
    }
    // restore the env-derived default (the ProfAB convention)
    graft.operators.Par.spreadEnabled =
      sys.env.get("SPARK_GRAFT_SPREAD").forall(_ != "0")
    spark.stop()
  }
}
