package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamDocIngest

/** Batch parity for the unbounded training-data ingest path: the
  * streaming quality→decontaminate→dedup→windowed-stats pipeline must
  * emit EXACTLY the rows the identical batch composition produces.
  *
  * Harness notes: event time is derived from the text hash so every
  * exact duplicate lands in the same window (making the surviving
  * aggregate well-defined regardless of which copy the dedup keeps),
  * and a far-future sentinel file pushes the watermark past all real
  * windows so append mode emits them (a window is only final once the
  * watermark passes — that IS the semantics, not a workaround).
  */
class StreamDocIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming ingest pipeline matches batch composition exactly") {
    val docs0 = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "source")
    // deterministic event time inside one UTC day, same for duplicates
    val base = 1704067200000000L // 2024-01-01
    val withTs = docs0.withColumn("ts",
      lit(base) + pmod(xxhash64(col("text")), lit(86400L)) * lit(1000000L))
    // benchmark = a static slice of the corpus; its docs must be
    // dropped from the stream as fully contaminated
    val bench = withTs.where(col("doc_id") % 50 === 0).select("text")
    val blob = StreamDocIngest.benchSketch(bench)

    // duplicate the whole corpus: dedup must drop every second copy
    val feed = withTs.unionAll(withTs)

    val dir = Files.createTempDirectory("graft_ingest").toString
    feed.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(feed.schema).parquet(dir)

    val out = StreamDocIngest(stream, blob, "ts",
      minQuality = 0.3, win = "1h", watermark = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ingest_test").start()
    try {
      q.processAllAvailable()
      // sentinel: one clean far-future doc advances the watermark so
      // all real windows close and emit
      spark.createDataFrame(Seq(
        (-1L, "the quick brown fox jumps over the lazy dog and the cat",
          "__sentinel", base + 10L * 86400L * 1000000L)))
        .toDF("doc_id", "text", "source", "ts")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ingest_test")
      .where(col("source") =!= "__sentinel")
      .select("source", "ts_begin", "ts_end", "n_docs", "n_tokens", "avg_quality")

    // identical stages, batch world: same cleanDocs code, batch dedup
    val want = StreamDocIngest.cleanDocs(feed, blob, minQuality = 0.3)
      .withColumn("__text_hash", xxhash64(col("text")))
      .dropDuplicates("source", "__text_hash")
      .groupBy(col("source"),
        window(timestamp_micros(col("ts")), "3600 seconds").as("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (graft.functions.Aggs.microsToD(
          sum(graft.functions.Aggs.micros(col("quality"))))
          / count(lit(1))).cast("double").as("avg_quality"))
      .select(col("source"),
        unix_micros(col("w.start")).as("ts_begin"),
        unix_micros(col("w.end")).as("ts_end"),
        col("n_docs"), col("n_tokens"), col("avg_quality"))

    assert(got.count() > 0, "no windows emitted — watermark never advanced?")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"stream=${got.count()} batch=${want.count()}")

    // the gates actually gated: fewer docs survive than arrived, and
    // every benchmark-contaminated doc is gone
    val survived = spark.table("ingest_test")
      .where(col("source") =!= "__sentinel")
      .agg(sum("n_docs")).head.getLong(0)
    assert(survived > 0 && survived < docs0.count(),
      s"survived=$survived of ${docs0.count()} — gates did nothing?")
  }
}
