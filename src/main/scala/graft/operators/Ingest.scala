package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental batch corpus ingest — the per-arriving-batch
  * composition a large-scale training-data pipeline runs, as one
  * operator (the batch twin of
  * [[graft.streaming.StreamDocIngest]]'s unbounded chain):
  *
  *   1. model-based quality gate ([[TextOps.classify]] `keep` label —
  *      the hashed linear classifier, scan-side);
  *   2. benchmark decontamination (the Bloom sketch from
  *      [[graft.streaming.StreamDocIngest.benchSketch]]; false
  *      positives only, so eval data can never leak through);
  *   3. intra-batch near-dedup: MinHash-LSH candidate pairs, the
  *      smaller id of each collision survives (greedy first-wins —
  *      the same direction the streaming path takes);
  *   4. cross-corpus dedup against the persisted signature store
  *      ([[Dedup.dedupAgainstStore]] — the already-ingested corpus is
  *      never re-hashed, its bucketed band keys join exchange-free);
  *   5. append the accepted docs' band keys to the store, so the NEXT
  *      batch dedups against them.
  *
  * Every stage is an already-verified operator unchanged; only the
  * batch is ever tokenized, hashed, or shuffled. Returns the accepted
  * docs, eagerly checkpointed — the result must be pinned BEFORE step
  * 5 writes, or a later re-execution of the lazy plan would re-read
  * the store, find the batch's own keys, and drop everything.
  */
object Ingest {

  def batch(spark: SparkSession, docs: DataFrame, storeTable: String,
            benchBlob: Option[Array[Byte]] = None, nBuckets: Int = 32,
            k: Int = 16, bands: Int = 4, shingleN: Int = 3,
            idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.graft.GraftExpressions._

    // bootstrap: an absent store is an empty corpus
    if (!spark.catalog.tableExists(storeTable))
      Dedup.writeSignatureStore(docs.limit(0), storeTable, nBuckets,
        k, bands, shingleN, idCol)

    // 1. classifier gate (semi join on id: classify's output frame is
    // (id, score) — the doc row with all its columns survives intact)
    val kept = TextOps.classify(docs, idCol)
      .where(col("label") === "keep").select(col(idCol))
    val gated = docs.join(kept, Seq(idCol), "left_semi")

    // 2. decontamination — stateless Bloom filter over the doc's
    // shingles, same expression the streaming path runs
    val clean = benchBlob.fold(gated) { blob =>
      gated.where(!exists(TextOps.shingleIds(col("text"), shingleN),
        sid => bloom_might_contain(blob, sid)))
    }

    // 3. intra-batch near-dedup: every candidate pair has id_a < id_b,
    // so dropping the id_b side keeps each collision's first doc
    val later = Dedup.minhashCandidates(clean, k, bands, shingleN, idCol)
      .select(col("id_b").as(idCol)).distinct()
    val firsts = clean.join(later, Seq(idCol), "left_anti")

    // 4. cross-corpus dedup against the store
    val novel = Dedup.dedupAgainstStore(spark, firsts, storeTable,
      k, bands, shingleN, idCol)

    // 5. pin the result, then ingest its band keys
    val accepted = novel.localCheckpoint()
    Dedup.appendToSignatureStore(accepted, storeTable, nBuckets,
      k, bands, shingleN, idCol)
    accepted
  }

  /** Continuous ingest: run [[batch]] on every micro-batch of an
    * unbounded doc stream via `foreachBatch`, writing accepted docs to
    * a parquet corpus directory. Complements
    * [[graft.streaming.StreamNearDedup]]'s watermark-bounded state
    * with the opposite trade: dedup state lives in the durable
    * bucketed store, so a duplicate is caught no matter how late it
    * arrives (unbounded horizon), at the cost of a store join per
    * micro-batch instead of in-memory state. Micro-batches are
    * serialized by Structured Streaming, so the read-store →
    * append-store sequence never races itself.
    *
    * foreachBatch is at-least-once on retry (the standard caveat):
    * replaying a micro-batch re-appends the same band keys — harmless,
    * the dedup verdicts don't change — but the corpus append can
    * duplicate rows; an exactly-once corpus needs an idempotent sink
    * keyed on `idCol`.
    *
    * Returns the started query; the caller owns its lifecycle.
    */
  def stream(docs: DataFrame, storeTable: String, corpusDir: String,
             checkpointDir: String, benchBlob: Option[Array[Byte]] = None,
             nBuckets: Int = 32, k: Int = 16, bands: Int = 4,
             shingleN: Int = 3, idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (mb: DataFrame, _: Long) =>
        batch(mb.sparkSession, mb, storeTable, benchBlob, nBuckets,
          k, bands, shingleN, idCol)
          .write.mode("append").parquet(corpusDir)
      }
      .start()
}
