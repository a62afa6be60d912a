package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); f
      println(f"[prof] $name%-28s ${math.min(t1-t0, System.nanoTime()-t1)/1e9}%.3f s")
    }
    val li = spark.read.parquet(dir + "/lineitem.parquet")
    t("count")           { li.count() }
    t("scan_all_noop")   { li.write.format("noop").mode("overwrite").save() }
    t("q1_full")         { SparkEntry.queries("q1_agg")(spark, dir).write.format("noop").mode("overwrite").save() }
    t("q1_doubleSum")    { li.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag","l_linestatus")
        .agg(sum(col("l_quantity")).as("a"), sum(col("l_extendedprice")).as("b"),
             avg(col("l_discount")).as("c"), count(lit(1)).as("d"))
        .write.format("noop").mode("overwrite").save() }
    t("q1_repart32")     { li.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .repartition(32)
        .groupBy("l_returnflag","l_linestatus")
        .agg(graft.functions.Aggs.sumExactD(col("l_quantity")).as("a"))
        .write.format("noop").mode("overwrite").save() }
    t("q1_dec18")        { li.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag","l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("a"),
             sum(col("l_extendedprice").cast("decimal(18,6)")).as("b"),
             sum((col("l_extendedprice")*(lit(1.0)-col("l_discount"))).cast("decimal(18,6)")).as("c"),
             sum((col("l_extendedprice")*(lit(1.0)-col("l_discount"))*(lit(1.0)+col("l_tax"))).cast("decimal(18,6)")).as("d"))
        .write.format("noop").mode("overwrite").save() }
    t("q1_longmicros")   { li.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag","l_linestatus")
        .agg(sum(round(col("l_quantity")*1e6).cast("long")).as("a"),
             sum(round(col("l_extendedprice")*1e6).cast("long")).as("b"),
             sum(round((col("l_extendedprice")*(lit(1.0)-col("l_discount")))*1e6).cast("long")).as("c"),
             sum(round((col("l_extendedprice")*(lit(1.0)-col("l_discount"))*(lit(1.0)+col("l_tax")))*1e6).cast("long")).as("d"))
        .write.format("noop").mode("overwrite").save() }
    def dmic(c: org.apache.spark.sql.Column) =
      sum(round(c*1e6).cast("long").cast("decimal(38,0)"))
    t("q1_decmicros")    { li.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag","l_linestatus")
        .agg(dmic(col("l_quantity")).as("a"),
             dmic(col("l_extendedprice")).as("b"),
             dmic(col("l_extendedprice")*(lit(1.0)-col("l_discount"))).as("c"),
             dmic(col("l_extendedprice")*(lit(1.0)-col("l_discount"))*(lit(1.0)+col("l_tax"))).as("d"))
        .write.format("noop").mode("overwrite").save() }
    def gmic(c: org.apache.spark.sql.Column) = {
      val d = c.cast("double")
      sum(when(abs(d) < lit(4.0e9), round(d*1e6).cast("long").cast("decimal(38,0)"))
        .otherwise((c.cast("decimal(38,6)")*lit(1000000L)).cast("decimal(38,0)")))
    }
    t("q1_guardmicros")  { li.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag","l_linestatus")
        .agg(gmic(col("l_quantity")).as("a"),
             gmic(col("l_extendedprice")).as("b"),
             gmic(col("l_extendedprice")*(lit(1.0)-col("l_discount"))).as("c"),
             gmic(col("l_extendedprice")*(lit(1.0)-col("l_discount"))*(lit(1.0)+col("l_tax"))).as("d"))
        .write.format("noop").mode("overwrite").save() }
    // parity check: dec18 vs dec38 per-group values
    locally { val d38 = li.groupBy("l_returnflag","l_linestatus")
        .agg(sum((col("l_extendedprice")*(lit(1.0)-col("l_discount"))*(lit(1.0)+col("l_tax"))).cast("decimal(38,6)")).cast("double").as("v"))
      val d18 = li.groupBy("l_returnflag","l_linestatus")
        .agg(sum((col("l_extendedprice")*(lit(1.0)-col("l_discount"))*(lit(1.0)+col("l_tax"))).cast("decimal(18,6)")).cast("double").as("v"))
      val lmu = li.groupBy("l_returnflag","l_linestatus")
        .agg((sum(round((col("l_extendedprice")*(lit(1.0)-col("l_discount"))*(lit(1.0)+col("l_tax")))*1e6).cast("long"))/1e6).as("v"))
      val a = d38.orderBy("l_returnflag","l_linestatus").collect().map(_.getDouble(2))
      val b = d18.orderBy("l_returnflag","l_linestatus").collect().map(_.getDouble(2))
      val c = lmu.orderBy("l_returnflag","l_linestatus").collect().map(_.getDouble(2))
      println("[prof] parity dec18==dec38: " + a.sameElements(b))
      println("[prof] parity longu==dec38: " + a.sameElements(c))
      println("[prof] vals " + a.take(2).mkString(",") + " | " + c.take(2).mkString(","))
    }
    t("q3_full")         { SparkEntry.queries("q3_join")(spark, dir).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
