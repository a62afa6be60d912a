package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B harness for the scan fan-out decision: for each named
  * query, runs the fanned (A) and raw (B) variants alternately in one
  * session (warm both, then A B B A — drift-cancelling order) and
  * prints min seconds per variant. The box's clock speed drifts
  * between JVMs (canary 0.27–0.83 s observed same day), so only
  * same-session alternating pairs are trustworthy.
  */
object ProfAB {
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

    def run(name: String, fan: Boolean): Double = {
      SparkEntry.fanoutEnabled = fan
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-32s ${"fan_s"}%8s ${"raw_s"}%8s ${"delta"}%8s")
    names.foreach { n =>
      try {
        run(n, true); run(n, false) // warm both
        val a1 = run(n, true); val b1 = run(n, false)
        val b2 = run(n, false); val a2 = run(n, true)
        val (a, b) = (math.min(a1, a2), math.min(b1, b2))
        println(f"$n%-32s $a%8.3f $b%8.3f ${a - b}%+8.3f")
      } catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}") }
    }
    // restore the env-derived default, not literal true (ADVICE r15):
    // a profiler run with SPARK_GRAFT_FANOUT=0 must leave the toggle off
    SparkEntry.fanoutEnabled = sys.env.get("SPARK_GRAFT_FANOUT").forall(_ != "0")
    spark.stop()
  }
}
