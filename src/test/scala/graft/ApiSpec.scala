package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ts.TimeSeries

class ApiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("atTime = latest event <= t per series; atFirst; sameAs") {
    import spark.implicits._
    val t = TimeSeries(Seq((1L, 100L, 1.0), (1L, 200L, 2.0), (1L, 300L, 3.0),
      (2L, 250L, 9.0)).toDF("k", "ts", "v"), "ts", Seq("k"))
    val at = t.atTime(220L).orderBy("k").collect()
    assert(at.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 200L)))
    assert(t.atFirst().orderBy("k").collect().map(_.getLong(1)).toSeq ==
      Seq(100L, 250L))
    assert(t.sameAs(t.copy(df = t.df.orderBy(rand()))))
    assert(!t.sameAs(t.copy(df = t.df.limit(2))))
  }

  test("readCsv round-trips a timeseries") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_csv").toString
    Seq(("2024-01-01 00:00:00", 1L, 5.5), ("2024-01-01 01:00:00", 1L, 6.5))
      .toDF("ts", "k", "v").write.mode("overwrite")
      .option("header", "true").csv(dir)
    val t = TimeSeries.readCsv(spark, dir, "ts", Seq("k"))
    val rows = t.df.orderBy("ts").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("ts") == 1704067200000000L) // epoch µs UTC
    assert(rows(1).getAs[Double]("v") == 6.5)
  }

  test("GraftExtensions injection path runs; registered SQL names work") {
    // a shared-JVM test can't build a second SparkContext, so exercise
    // the extension object directly + the runtime registration path
    new org.apache.spark.sql.graft.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
    org.apache.spark.sql.graft.GraftExpressions.register(spark)
    val r = spark.sql(
      "SELECT simhash24(array('a','b')) AS s, " +
        "vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head()
    assert(r.getDouble(1) == 11.0)
    assert(r.getLong(0) >= 0L)
  }
}
