package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.streaming.StreamNearDedup

/** Streaming MinHash-LSH near-dedup: first arrival claims its band
  * buckets; later docs colliding in every band (exact/near dups) are
  * dropped; novel docs pass. The collision structure is tied back to
  * the BATCH LSH operator — the stream drops exactly the docs the
  * batch banding pairs with an earlier arrival.
  */
class StreamNearDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("first arrival wins; later near-dups drop; novel docs pass") {
    val base = 1704067200000000L // 2024-01-01, all inside one 1h window
    val d1 = "the quick brown fox jumps over the lazy dog by the river bank"
    val d2 = "colorless green ideas sleep furiously under a pale winter moon"
    val d3 = "to be or not to be that is the question for tonight"
    val d6 = "entirely different words about spark catalyst plans and shuffles here"
    val batch1 = Seq((1L, d1, base), (2L, d2, base + 60000000L),
      (3L, d3, base + 120000000L)).toDF("doc_id", "text", "ts")
    val batch2 = Seq((5L, d1, base + 600000000L), // exact dup of doc 1
      (6L, d6, base + 660000000L)).toDF("doc_id", "text", "ts")

    // the batch operator agrees this is the collision structure:
    // (1,5) band-collide, doc 6 collides with nothing
    val pairs = Dedup.minhashCandidates(batch1.unionAll(batch2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L)))
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))

    val dir = Files.createTempDirectory("graft_neardedup").toString
    batch1.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch1.schema).parquet(dir)
    val kept = StreamNearDedup.minhash(stream, "ts",
      win = "1h", watermark = "1 hour")
    val q = kept.writeStream.outputMode("append")
      .format("memory").queryName("neardedup_test").start()
    try {
      q.processAllAvailable() // batch 1 claims all its buckets
      batch2.write.mode("append").parquet(dir)
      q.processAllAvailable() // dup arrives AFTER state exists
      Seq((99L, "sentinel text to advance the watermark and close windows",
        base + 10L * 86400L * 1000000L)).toDF("doc_id", "text", "ts")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("neardedup_test")
      .where(col("doc_id") =!= 99L)
    val ids = got.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 6L), s"kept=$ids")
    // kept rows carry the closed window
    assert(got.select("ts_begin").distinct().as[Long].head() == base)
  }
}
