package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.8): media as opaque
  * `binary` payloads plus typed metadata, with decode / feature
  * extraction as a batched per-partition pass — the Scala-Spark
  * equivalent of a `mapInPandas` stage.
  *
  * The decode step is a clearly-marked deterministic STUB (the real
  * image/audio codecs are not in this environment); everything around
  * it — schema, binary column, partition batching, typed output — is
  * the real production shape: swap [[MediaDecoder.decode]] for a codec
  * call and nothing else changes.
  */
object Multimodal {

  /** Raw media record: id + opaque bytes (as parquet would store it). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed decode output — the "image metadata" struct. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                             height: Long, n_frames: Long)

  /** STUB decoder: derives fake-but-deterministic media properties from
    * the payload's rolling hash. A real build replaces this body with
    * e.g. javax.imageio / ffmpeg bindings; the signature (bytes in,
    * typed meta out) is the contract.
    */
  object MediaDecoder {
    def decode(r: MediaRow): MediaMeta = {
      // the STUB treats the payload as UTF-8 text (true for this
      // pipeline's text-derived payloads) and folds its code points to
      // match the SQL oracle; a REAL decoder keys on raw bytes and
      // replaces this whole body, so the lossy UTF-8 decode of
      // arbitrary binary (U+FFFD) is a stub-only property
      val h = graft.functions.HashImpl.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromBytes(r.payload))
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = r.payload.length.toLong,
        width = 64L + h % 512L,
        height = 64L + (h / 512L) % 512L,
        n_frames = 1L + h % 8L)
    }
  }

  /** Attach a binary payload column (here: the utf-8 bytes of `text`,
    * standing in for image bytes read from object storage).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "utf-8"))

  /** The batched decode pass: one iterator per partition (so a real
    * decoder can amortize codec init per batch, exactly like
    * mapInPandas), typed output via Encoders.
    */
  def decodeAll(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows => rows.map(MediaDecoder.decode) }
  }
}
