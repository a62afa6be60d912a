package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling spot-run for the families whose cost is super-linear
  * without their dials turned (SURVEY §5): times a fixed subset at
  * whatever SPARK_GRAFT_SF_DIR points to, printing the same one-line
  * JSON shape as [[Bench]].
  *
  * Two kinds of legs:
  *  - registered-query call-throughs (phash, IVF, PQ, edit-dedup):
  *    their dials auto-size from the corpus count (√n coarse
  *    codebook, fixed-256 PQ codebook, 64/16 phash geometry), so the
  *    registered plan IS the production plan at every scale;
  *  - dial-turned operator calls where the dial cannot live inside a
  *    fixed zero-arg registration:
  *      · emb_dedup_cosine_scaled — `Knn.autoPlanes(n)` hyperplanes
  *        (cell population pinned near 125 instead of growing ∝ n;
  *        the registered 4-plane geometry stays the small-corpus
  *        test shape its DuckDB oracle mirrors);
  *      · emb_mmr_fixedq — MMR rerank with the CONSTANT base-copy
  *        query batch: a serving rerank's |Q| is an operational
  *        constant, while the registered query's %100 sampling grows
  *        |Q| ∝ n and would charge the curve O(n²/100) candidate
  *        generation no rerank deployment pays.
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val EmbDim = 16
    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nEmb = emb.count()
    val planes = graft.operators.Knn.autoPlanes(nEmb)
    // the base-copy query batch: identical vectors at every scale
    // factor (ScaleUp shifts replica ids by +1e8 per copy)
    def baseQ = emb.where(col("vec_id") % 100 === 0 &&
      col("vec_id") < 100000000L)

    val registered = Seq("mm_phash", "mm_phash_eval", "emb_knn_ivf",
      "emb_ivf_pq", "emb_ivf_probe_curve", "emb_pq", "doc_dedup_edit")
    val dialed: Seq[(String, () => DataFrame)] = Seq(
      "emb_dedup_cosine_scaled" -> (() => graft.operators.Knn
        .cosineDupPairsLsh(emb, EmbDim, 0.3, nPlanes = planes)),
      "emb_mmr_fixedq" -> (() => graft.operators.Knn
        .mmrTopK(emb, baseQ, EmbDim)))
    val legs: Seq[(String, () => DataFrame)] =
      registered.map(n => n -> (() => SparkEntry.queries(n)(spark, sfDir))) ++
        dialed

    def runOnce(name: String, mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      try mk().write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[benchscale] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    legs.foreach { case (n, mk) => runOnce(n, mk) } // warmup
    val passes = (1 to 2).map(_ => legs.map { case (n, mk) =>
      n -> runOnce(n, mk) }.toMap)
    val results = legs.map { case (n, _) =>
      val vs = passes.map(_(n)).filter(_ >= 0)
      n -> (if (vs.isEmpty) -1.0 else vs.min)
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val sfLabel = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    println(s"""{"metric":"scale_subset","value":${f(total)},"unit":"sec",""" +
      s""""queries":$qs,"sf":"$sfLabel","n_emb":$nEmb,"lsh_planes":$planes}""")
    spark.stop()
    sys.exit(0)
  }
}
