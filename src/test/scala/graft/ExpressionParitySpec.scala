package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Knn, TextOps}

/** The native codegen'd expressions must be bit-identical to their
  * higher-order-function twins (which are definitionally the DuckDB
  * oracle formulas).
  */
class ExpressionParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("PolyHash == HOF fold, incl. unicode and empty-ish strings") {
    val df = Seq("hello world", "a", "x y z w", "Ünïcodé ﬆring 汉字",
      " leading and  double  spaces").toDF("text")
    val bad = df.select(TextOps.polyHash($"text").as("n"),
      TextOps.polyHashHof($"text").as("h")).where($"n" =!= $"h")
    assert(bad.isEmpty)
  }

  test("ShingleHashes == HOF shingle ids on real documents") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = docs.select(
      TextOps.shingleIds($"text", 3).as("n"),
      TextOps.shingleIdsHof($"text", 3).as("h")).where($"n" =!= $"h")
    assert(bad.isEmpty)
    // short docs: fewer tokens than the shingle size -> empty array
    val short = Seq("one two").toDF("text")
      .select(TextOps.shingleIds($"text", 3).as("s")).head()
    assert(short.getSeq[Long](0).isEmpty)
  }

  test("VecDot == HOF index fold on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.select($"embedding".as("a"))
      .crossJoin(emb.limit(3).select($"embedding".as("b")))
    val bad = pairs.select(Knn.dot($"a", $"b", 64).as("n"),
      Knn.dotHof($"a", $"b", 64).as("h")).where($"n" =!= $"h")
    assert(bad.isEmpty)
  }

  test("VecDotD on widened arrays == float VecDot (same fold)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.select($"embedding".as("a"))
      .crossJoin(emb.limit(3).select($"embedding".as("b")))
      .select($"a", $"b",
        transform($"a", x => x.cast("double")).as("ad"),
        transform($"b", x => x.cast("double")).as("bd"))
    val bad = pairs.select(Knn.dot($"a", $"b", 64).as("f"),
      org.apache.spark.sql.graft.GraftExpressions.vec_dot_d($"ad", $"bd").as("d"))
      .where($"f" =!= $"d")
    assert(bad.isEmpty)
  }

  test("VecSubL2 == HOF subspace fold on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.select($"embedding".as("a"))
      .crossJoin(emb.limit(3).select($"embedding".as("b")))
      .withColumn("s", explode(sequence(lit(0), lit(3))))
    val subDim = 16
    val hof = aggregate(
      transform(sequence($"s" * subDim + 1, ($"s" + 1) * subDim),
        i => {
          val d = element_at($"a", i).cast("double") -
            element_at($"b", i).cast("double")
          d * d
        }),
      lit(0.0), (acc, x) => acc + x)
    val bad = pairs.select(
      org.apache.spark.sql.graft.GraftExpressions
        .vec_sub_l2($"a", $"b", $"s", subDim).as("n"),
      hof.as("h")).where($"n" =!= $"h")
    assert(bad.isEmpty)
  }

  test("EwmaAgg window fold == collect_list HOF fold on real events") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", org.apache.spark.sql.graft.Bridge.fldiv(col("ts"), 1000L))
      .select("user_id", "ts", "value")
    val native = graft.operators.Trend.ewma(ev, "ts", "value", Seq("user_id"))
    val hof = graft.operators.Trend.ewmaHof(ev, "ts", "value", Seq("user_id"))
    assert(native.count() == ev.count())
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // null handling: nulls drop out of the fold, seed skips to the
    // first non-null value
    val withNulls = Seq[(Long, java.lang.Double)](
      (1L, null), (2L, 4.0), (3L, null), (4L, 8.0))
      .toDF("ts", "v").withColumn("k", lit("a"))
    val got = graft.operators.Trend.ewma(withNulls, "ts", "v", Seq("k"))
      .orderBy("ts").select("ewma").collect()
    assert(got(0).isNullAt(0))       // nothing seen yet
    assert(got(1).getDouble(0) == 4.0) // seeded
    assert(got(2).getDouble(0) == 4.0) // null skipped, acc carried
    assert(got(3).getDouble(0) ==
      math.floor((4.0 * 0.7 + 8.0 * 0.3) * 1e6) / 1e6)
  }

  test("shingle_hashes / vec_sub_l2 registered for SQL use") {
    org.apache.spark.sql.graft.GraftExpressions.register(spark)
    assert(spark.sql(
      "SELECT shingle_hashes(array('a','b','c'), 2) AS s").head()
      .getSeq[Long](0).length == 2)
    val d = spark.sql(
      """SELECT vec_sub_l2(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)), 0, 2) AS d"""
        .stripMargin).head().getDouble(0)
    assert(d == 5.0)
  }

  test("poly_hash / vec_dot registered for SQL use") {
    org.apache.spark.sql.graft.GraftExpressions.register(spark)
    assert(spark.sql("SELECT poly_hash('abc') AS h").head().getLong(0) ==
      ((('a' * 31 + 'b') % 1000000007L) * 31 + 'c') % 1000000007L)
  }
}
