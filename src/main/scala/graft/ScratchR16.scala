package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 measurement scratchpad: named UNREGISTERED query variants
  * (reshape candidates, r14 reference shapes, isolated sub-legs) timed
  * with the ProfAB protocol — same-JVM alternating pairs, noop sink —
  * so accept/reject decisions don't depend on box drift. Nothing here
  * is part of the declared query surface; SparkEntry is untouched.
  *
  *   sbt "runMain graft.ScratchR16 ab bc_r15 bc_new"   — A/B two variants
  *   sbt "runMain graft.ScratchR16 eq bc_r15 bc_new"   — assert equal rows
  *   sbt "runMain graft.ScratchR16 t bc_truth"         — time one variant
  */
object ScratchR16 {
  import graft.operators.{Dedup, TextOps}

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---- doc_minhash_band_curve variants -------------------------------

  /** r14 shape: independent per-leg truth/cand joins. */
  private def bcR14(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val truth = Dedup.ngramJaccardPairs(docs)
      .select("id_a", "id_b").localCheckpoint(false)
    def leg(b: Int): DataFrame = {
      val cand = Dedup.minhashCandidates(docs, bands = b)
        .localCheckpoint(false)
      val t = truth.agg(count(lit(1)).as("n_truth"))
      val c = cand.agg(count(lit(1)).as("n_cand"))
      val h = truth.join(cand, Seq("id_a", "id_b"))
        .agg(count(lit(1)).as("n_hits"))
      t.crossJoin(c).crossJoin(h)
        .select(lit(s"bands_$b").as("method"), col("n_truth"),
          col("n_cand"), col("n_hits"),
          when(col("n_truth") > 0, round(
            col("n_hits").cast("double") / col("n_truth"), 6)).as("recall"),
          when(col("n_cand") > 0, round(
            col("n_hits").cast("double") / col("n_cand"), 6)).as("prec"))
    }
    leg(2).unionByName(leg(4)).unionByName(leg(8))
  }

  /** Candidate single-join reshape: nested band families (an aligned
    * run of 16/b equal hash slots contains an aligned run of every
    * finer family), so ONE (lvl, band, bk) self-join + min(lvl) per
    * pair yields every leg's candidate set as min_lvl <= b.
    */
  private def bcNew(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val withSh = docs.select(col("doc_id"),
      TextOps.shingleIds(col("text"), 3).as("sids")).localCheckpoint(false)
    val truth = Dedup.ngramJaccardPairsFromShingles(withSh)
      .select("id_a", "id_b").localCheckpoint(false)
    val sigs = Dedup.minhashSignaturesFromShingles(withSh)
    val bandStructs = for {
      bands <- Seq(2, 4, 8); b <- 0 until bands
    } yield {
      val r = 16 / bands
      val hs = (b * r until b * r + r).map(i => col(s"h$i"))
      struct(lit(bands).as("lvl"), lit(b).as("band"),
        hs.reduceLeft((acc, h) => (acc * lit(31L) + h) % lit(TextOps.HashMod))
          .as("bk"))
    }
    val banded = sigs.select(col("doc_id"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.lvl").as("lvl"),
        col("bb.band").as("band"), col("bb.bk").as("bk"))
    val a = banded.select(col("doc_id").as("id_a"), col("lvl"), col("band"),
      col("bk"))
    val b = banded.select(col("doc_id").as("id_b"), col("lvl"), col("band"),
      col("bk"))
    val pairsMin = a.join(b, Seq("lvl", "band", "bk"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(min(col("lvl")).as("min_lvl"))
      .localCheckpoint(false)
    val legs = Seq(2, 4, 8)
    val ncRow = pairsMin.agg(
      legs.map(bv => coalesce(sum(when(col("min_lvl") <= bv, 1L)), lit(0L))
        .as(s"c$bv")).head,
      legs.map(bv => coalesce(sum(when(col("min_lvl") <= bv, 1L)), lit(0L))
        .as(s"c$bv")).tail: _*)
    val nhCols = count(lit(1)).as("n_truth") +:
      legs.map(bv => coalesce(sum(when(col("min_lvl") <= bv, 1L)), lit(0L))
        .as(s"h$bv"))
    val nhRow = truth.join(pairsMin, Seq("id_a", "id_b"), "left")
      .agg(nhCols.head, nhCols.tail: _*)
    s.range(1)
      .select(explode(array(legs.map(lit(_)): _*)).as("bv"))
      .crossJoin(broadcast(ncRow)).crossJoin(broadcast(nhRow))
      .select(concat(lit("bands_"), col("bv")).as("method"),
        col("n_truth"),
        legs.map(bv => when(col("bv") === bv, col(s"c$bv")))
          .reduce(coalesce(_, _)).as("n_cand"),
        legs.map(bv => when(col("bv") === bv, col(s"h$bv")))
          .reduce(coalesce(_, _)).as("n_hits"))
      .select(col("method"), col("n_truth"), col("n_cand"), col("n_hits"),
        when(col("n_truth") > 0,
          round(col("n_hits").cast("double") / col("n_truth"), 6)).as("recall"),
        when(col("n_cand") > 0,
          round(col("n_hits").cast("double") / col("n_cand"), 6)).as("prec"))
  }

  /** Just the exact-Jaccard truth leg (the shared floor of the band
    * curve and doc_dedup_eval).
    */
  private def bcTruth(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    Dedup.ngramJaccardPairs(docs).select("id_a", "id_b")
  }

  /** bcTruth with the posting self-join pinned to the full shuffle
    * width (explicit repartition by sid on both sides): AQE coalesces
    * the 24 MB sid shuffle to ~16 partitions by byte size, but the
    * pair explosion + partial agg happens AFTER the shuffle read, so
    * byte-sized partitions leave half the cores idle.
    */
  private def bcTruthRep(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = tbl(s, dir, "documents")
    val withSh = docs.select(col("doc_id"),
      TextOps.shingleIds(col("text"), 3).as("sids"))
    val inv = withSh.select(col("doc_id"), size(col("sids")).as("n_sh"),
      explode(col("sids")).as("sid"))
    val p = s.sessionState.conf.numShufflePartitions
    val a = inv.select(col("doc_id").as("id_a"), col("n_sh").as("n_a"),
      col("sid")).repartition(p, col("sid"))
    val b = inv.select(col("doc_id").as("id_b"), col("n_sh").as("n_b"),
      col("sid")).repartition(p, col("sid"))
    a.hint("shuffle_hash").join(b, Seq("sid"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("n_shared"))
      .select(col("id_a"), col("id_b"),
        round(col("n_shared").cast("double")
          / (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
      .where(col("jaccard") >= 0.5)
      .select("id_a", "id_b")
  }

  // ---- emb_ann_recall variants ----------------------------------------

  /** The registered r15 eval with the lp15/book/cells checkpoints
    * REMOVED (pure plan sharing — AQE ReuseExchange dedups identical
    * subtrees at runtime): is the materialization barrier of four
    * sequential lazy checkpoints costing more than the re-derivation
    * it saves?
    */
  private def arNoCkpt(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Knn
    import org.apache.spark.sql.expressions.Window
    val EmbDim = 64
    val emb = tbl(s, dir, "embeddings")
    val q = emb.where(col("vec_id") % 100 === 0 && col("vec_id") < 100000000L)
    val truth = Knn.bruteTopK(emb, q, EmbDim, 3)
      .select("query_id", "neighbor_id").localCheckpoint(false)
    val cells = Knn.ivfCellsPlan(emb, q, EmbDim)
    val book = Knn.pqCodebookLearned(emb, EmbDim)
    val lp15 = Knn.ivfPqTopKLearned(emb, q, EmbDim, 15,
      shared = Some(cells), cb = Some(book))
    val legs: Seq[(String, DataFrame)] = Seq(
      "lsh" -> Knn.lshTopK(emb, q, EmbDim, 3),
      "ivf" -> Knn.ivfTopK(emb, q, EmbDim, 3, shared = Some(cells)),
      "ivf_learned" -> Knn.ivfTopKLearned(emb, q, EmbDim, 3),
      "ivf_pq" -> Knn.ivfPqTopK(emb, q, EmbDim, 3, shared = Some(cells)),
      "ivf_pq_residual" ->
        Knn.ivfPqResidualTopK(emb, q, EmbDim, 3, shared = Some(cells)),
      "ivf_pq_learned" -> lp15.where(col("rank") <= 3),
      "ivf_pq_rerank" -> Knn.exactRerank(emb, q,
        lp15.select("query_id", "neighbor_id"), EmbDim, 3),
      "sq" -> Knn.sqSearchTopK(emb, q, EmbDim, 3))
    val cand = legs.map { case (m, df) =>
        df.select(lit(m).as("method"), col("query_id"),
          col("neighbor_id"), lit(1).as("__h"))
      }.reduce(_ unionByName _)
    truth.select(col("query_id"), col("neighbor_id"),
        explode(array(legs.map(l => lit(l._1)): _*)).as("method"))
      .join(cand, Seq("method", "query_id", "neighbor_id"), "left")
      .groupBy(col("method"))
      .agg(count(lit(1)).as("n_truth"), count(col("__h")).as("n_hits"),
        round(count(col("__h")).cast("double") / count(lit(1)), 6)
          .as("recall"))
      .select(col("method"), col("n_truth"), col("n_hits"), col("recall"))
  }

  // ---- doc_lm_score variants ------------------------------------------

  /** TextOps.lmScore with the bigram stream lazily checkpointed: the
    * registered shape re-derives bg (tokenize + zip_with + explode)
    * for c2, c1 AND the scoring join — three corpus scans.
    */
  private def lmCkpt(s: SparkSession, dir: String): DataFrame = {
    val k = 0.5
    val idCol = "doc_id"
    val df = tbl(s, dir, "documents")
    val toks = df.select(col(idCol), TextOps.tokens(col("text")).as("__tk"))
    val bg = toks.where(size(col("__tk")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("__tk"), lit(1), size(col("__tk")) - 1),
        slice(col("__tk"), lit(2), size(col("__tk")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .localCheckpoint(false)
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("__c2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("__c1"))
    val v = toks.select(explode(col("__tk")).as("__t"))
      .agg(countDistinct(col("__t")).as("__V"))
    val term = bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col(idCol),
        round(log((col("__c2") + lit(k)) / (col("__c1") + lit(k) * col("__V")))
          * lit(1e6)).cast("long").as("__tu"))
    val sAgg = term.groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__tu")).as("__su"))
    df.select(col(idCol)).join(sAgg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(-(col("__su").cast("double")) / lit(1e6) / col("n_bigrams"), 6)
          .as("lm_nll"))
  }

  /** lmScoreKN's r15 shape (bg NOT checkpointed — re-derived by the
    * scoring join) for pairing against the registered r16 shape.
    */
  private def knOld(s: SparkSession, dir: String): DataFrame = {
    val discount = 0.75
    val idCol = "doc_id"
    val df = tbl(s, dir, "documents")
    val toks = df.select(col(idCol), TextOps.tokens(col("text")).as("__tk"))
    val bg = toks.where(size(col("__tk")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("__tk"), lit(1), size(col("__tk")) - 1),
        slice(col("__tk"), lit(2), size(col("__tk")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("__c2"))
      .localCheckpoint(false)
    val left = c2.groupBy("w1")
      .agg(sum(col("__c2")).as("__c1"), count(lit(1)).as("__t1"))
    val cont = c2.groupBy("w2").agg(count(lit(1)).as("__cont"))
    val btot = c2.agg(count(lit(1)).as("__B"))
    val p = greatest(col("__c2").cast("double") - lit(discount), lit(0.0)) /
      col("__c1").cast("double") +
      lit(discount) * col("__t1").cast("double") / col("__c1").cast("double") *
        col("__cont").cast("double") / col("__B").cast("double")
    val term = bg.join(c2, Seq("w1", "w2")).join(left, Seq("w1"))
      .join(cont, Seq("w2")).crossJoin(broadcast(btot))
      .select(col(idCol), round(log(p) * lit(1e6)).cast("long").as("__tu"))
    val sAgg = term.groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__tu")).as("__su"))
    df.select(col(idCol)).join(sAgg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(-(col("__su").cast("double")) / lit(1e6) / col("n_bigrams"), 6)
          .as("kn_nll"))
  }

  /** doc_topic_cluster's r15 featurization (16 interpreted filter
    * folds, one per bucket) for pairing against the registered
    * TokenCountVec shape.
    */
  private def tcOld(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Knn, Par}
    val dim = 16
    val vecs = Par.fanout(tbl(s, dir, "documents"))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
      .where(size(col("__tk")) > 0)
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          size(filter(col("__tk"), t =>
            pmod(TextOps.polyHash(t), lit(dim.toLong)) === j.cast("long")))
            .cast("float")).as("tvec"))
      .localCheckpoint(false)
    Knn.kmeans(vecs, dim, idCol = "doc_id", vecCol = "tvec")
  }

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tc_old" -> (tcOld _),
    "tc_cur" -> ((s, dir) => SparkEntry.queries("doc_topic_cluster")(s, dir)),
    "kn_old" -> (knOld _),
    "kn_cur" -> ((s, dir) => SparkEntry.queries("doc_lm_kn")(s, dir)),
    "bc_truth_rep" -> (bcTruthRep _),
    "bc_r15" -> ((s, dir) => SparkEntry.queries("doc_minhash_band_curve")(s, dir)),
    "bc_r14" -> (bcR14 _),
    "bc_new" -> (bcNew _),
    "bc_truth" -> (bcTruth _),
    "ar_cur" -> ((s, dir) => SparkEntry.queries("emb_ann_recall")(s, dir)),
    "ar_nockpt" -> (arNoCkpt _),
    "lm_cur" -> ((s, dir) => SparkEntry.queries("doc_lm_score")(s, dir)),
    "lm_ckpt" -> (lmCkpt _)
  )

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

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      variants(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.toList match {
      case "ab" :: a :: b :: Nil =>
        run(a); run(b) // warm
        val a1 = run(a); val b1 = run(b)
        val b2 = run(b); val a2 = run(a)
        println(f"AB $a%-12s ${math.min(a1, a2)}%8.3f   ($a1%.3f/$a2%.3f)")
        println(f"AB $b%-12s ${math.min(b1, b2)}%8.3f   ($b1%.3f/$b2%.3f)")
      case "eq" :: a :: b :: Nil =>
        val ra = variants(a)(spark, sfDir).collect().map(_.toString).sorted
        val rb = variants(b)(spark, sfDir).collect().map(_.toString).sorted
        println(s"EQ rows ${ra.length}/${rb.length} equal=${ra.sameElements(rb)}")
        if (!ra.sameElements(rb)) {
          ra.diff(rb).take(5).foreach(r => println(s"  only in $a: $r"))
          rb.diff(ra).take(5).foreach(r => println(s"  only in $b: $r"))
        }
      case "t" :: names =>
        names.foreach { n => run(n); val x = math.min(run(n), run(n))
          println(f"T $n%-12s $x%8.3f") }
      case other => sys.error(s"usage: ab|eq|t names...; got $other")
    }
    spark.stop()
  }
}
