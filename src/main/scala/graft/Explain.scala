package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of the named
  * queries (or all) — used to keep parquet pushdown, broadcast choices
  * and shuffle counts honest while iterating.
  *
  *   sbt "runMain graft.Explain q1_agg q3_join"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      val exchanges = df.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Exchange"))
      println(s"[exchanges in initial physical plan: $exchanges]")
    }
    spark.stop()
  }
}
