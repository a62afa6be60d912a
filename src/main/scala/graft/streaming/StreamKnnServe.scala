package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming similarity SERVING: an unbounded stream of query vectors
  * answered from the persisted cell-partitioned IVF index
  * (graft.operators.Knn.writeIvfIndex) — the online half of the
  * index-build/ingest story, the shape a retrieval endpoint or
  * dedup-on-arrival service runs at corpus scale.
  *
  * Per micro-batch, `foreachBatch` runs the exact batch
  * `Knn.searchIvfIndex` plan against the (static, on-disk) index and
  * hands the ranked top-k to `sink` — so the stream answers are
  * DEFINITIONALLY identical to a batch query of the same vectors:
  * same probed cells, same exact-cosine ranking, same tie-breaks. The
  * index can be grown between batches by the ingest side
  * (appendToIvfIndex) without touching this query; each micro-batch
  * sees the files committed at its start.
  *
  * Scale shape: the per-batch cost is the batch search's — probed
  * cells only, planning-time partition pruning on the cell column —
  * and the query stream itself is the only unbounded input (no
  * stream-side state at all).
  */
object StreamKnnServe {

  def apply(spark: SparkSession, queries: DataFrame, indexPath: String,
            dim: Int, k: Int, nProbe: Int = 2)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.Knn.searchIvfIndex(
            spark, indexPath, batch, dim, k, nProbe), id)
      }
      .start()
}
