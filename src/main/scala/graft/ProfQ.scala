package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query profiler: wall seconds, Spark job/stage/task counts and
  * total executor task time for each named query — separates fixed
  * driver/scheduling overhead (many tiny jobs) from real task compute.
  *
  *   sbt "runMain graft.ProfQ emb_ann_recall doc_dedup_eval"
  *
  * Methodology matches Bench (noop sink, warm run first, min of two
  * timed runs for the wall clock; listener deltas from the LAST run).
  */
object ProfQ {
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

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val gcTimeMs = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    // per-stage attribution: (first callsite line, n_tasks, run ms)
    val stageInfoMap = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageTimeMs = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, AtomicInteger]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        stageInfoMap.put(s.stageInfo.stageId,
          s.stageInfo.name.take(110))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          gcTimeMs.addAndGet(m.jvmGCTime)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          stageTimeMs.computeIfAbsent(t.stageId, _ => new AtomicLong(0))
            .addAndGet(m.executorRunTime)
          stageTasks.computeIfAbsent(t.stageId, _ => new AtomicInteger(0))
            .incrementAndGet()
        }
      }
    })
    val verbose = sys.env.get("PROFQ_STAGES").contains("1")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-32s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s ${"task_s"}%8s ${"gc_s"}%6s ${"shufMB"}%8s")
    names.foreach { n =>
      try {
        runOnce(n) // warm
        val w1 = runOnce(n)
        jobs.set(0); stages.set(0); tasks.set(0)
        taskTimeMs.set(0); gcTimeMs.set(0); shufWrite.set(0)
        stageInfoMap.clear(); stageTimeMs.clear(); stageTasks.clear()
        val w2 = runOnce(n)
        // listener is async; let the queue drain
        Thread.sleep(300)
        println(f"$n%-32s ${math.min(w1, w2)}%8.3f ${jobs.get}%5d " +
          f"${stages.get}%6d ${tasks.get}%6d ${taskTimeMs.get / 1e3}%8.2f " +
          f"${gcTimeMs.get / 1e3}%6.2f ${shufWrite.get / 1e6}%8.1f")
        if (verbose) {
          import scala.jdk.CollectionConverters._
          stageTimeMs.asScala.toSeq.sortBy(-_._2.get).take(6).foreach {
            case (sid, ms) =>
              println(f"    stage $sid%4d ${ms.get / 1e3}%8.2f s " +
                f"${stageTasks.get(sid).get}%4d tasks  " +
                stageInfoMap.getOrDefault(sid, "?"))
          }
        }
      } catch { case e: Throwable =>
        println(s"$n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
