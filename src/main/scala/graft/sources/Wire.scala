package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ts.TimeSeries

/** pypond wire format (reference: pypond/series.py:95-170 + 201
  * to_json, pypond/io/): a series is one JSON document
  *
  *   {"name": "traffic", "utc": true,
  *    "columns": ["time", "in", "out"],
  *    "points": [[1400425947000, 52, 34], ...]}
  *
  * with `time` in epoch ms. graft reads wire docs into the canonical
  * (ts: epoch-µs long, value columns) DataFrame shape and writes one
  * wire doc PER SERIES KEY — so a 100 TB frame of millions of series
  * exports as millions of independent documents, not a driver-side
  * collect.
  */
object Wire {

  /** Read wire-format JSON documents (one per file or line-delimited
    * objects) into a TimeSeries. Column names come from the doc's
    * `columns` field; `time` becomes the µs `ts`.
    */
  def read(spark: SparkSession, path: String, multiLine: Boolean = true): TimeSeries = {
    val raw = spark.read.option("multiLine", multiLine).json(path)
    fromWireDf(raw)
  }

  /** Parse an in-memory collection of wire JSON strings. */
  def parse(spark: SparkSession, docs: Seq[String]): TimeSeries = {
    import spark.implicits._
    fromWireDf(spark.read.json(docs.toDS()))
  }

  private def fromWireDf(raw: DataFrame): TimeSeries = {
    // `columns` is series metadata (same for every doc of a series
    // family); reading head() is a metadata lookup, not a data collect.
    val first = raw.select("columns").head()
    val cols = first.getSeq[String](0)
    require(cols.headOption.contains("time"),
      s"wire columns must start with 'time', got $cols")
    val valueCols = cols.drop(1)
    val exploded = raw.select(col("name"), explode(col("points")).as("p"))
    val proj = Seq(col("name"),
      (element_at(col("p"), 1).cast("long") * 1000L).as("ts")) ++
      valueCols.zipWithIndex.map { case (c, i) =>
        element_at(col("p"), i + 2).as(c)
      }
    TimeSeries(exploded.select(proj: _*), "ts", Seq("name"))
  }

  /** Export: one wire-format JSON document per series key, emitted as
    * a DataFrame of (key cols..., wire: string). Points are ordered by
    * time inside each doc (sort happens inside the per-key aggregation,
    * not globally).
    */
  def toWireDocs(df: DataFrame, tsCol: String, valueCols: Seq[String],
                 keyCols: Seq[String], name: Column): DataFrame = {
    val point = array(
      (org.apache.spark.sql.graft.Bridge.fldiv(col(tsCol), 1000L).cast("double") +:
        valueCols.map(c => col(c).cast("double"))): _*)
    val grouped = df
      .withColumn("__point", point)
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col(tsCol), col("__point"))))
        .as("__pts"))
      .withColumn("points", transform(col("__pts"), p => p.getField("__point")))
      .drop("__pts")
    grouped.select(keyCols.map(col) :+
      to_json(struct(
        name.as("name"),
        lit(true).as("utc"),
        array((lit("time") +: valueCols.map(lit)): _*).as("columns"),
        col("points"))).as("wire"): _*)
  }
}
