package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object AggProf {
  def time[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PHASE $l%-34s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach { n =>
      try Tables.table(spark, d, n).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def li = Tables.table(spark, d, "lineitem")
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    for (r <- 1 to 3) {
      println(s"--- round $r")
      time("scan all cols")(noop(li))
      time("scan 7 cols")(noop(li.select("l_returnflag","l_linestatus","l_quantity","l_extendedprice","l_discount","l_tax","l_shipdate")))
      time("filter+group count only")(noop(li
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01 00:00:00")))
        .groupBy("l_returnflag","l_linestatus").agg(count(lit(1)))))
      time("one dsum")(noop(li
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01 00:00:00")))
        .groupBy("l_returnflag","l_linestatus").agg(Det.dsum(col("l_quantity")))))
      time("sum double (non-det)")(noop(li
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01 00:00:00")))
        .groupBy("l_returnflag","l_linestatus").agg(sum(col("l_quantity")))))
      time("sum long-scaled")(noop(li
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01 00:00:00")))
        .groupBy("l_returnflag","l_linestatus")
        .agg(sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)")))))
      time("full q_agg_hash")(CacheScope.scoped{noop(graft.operators.Relational.queries("q_agg_hash")(spark, d))})
    }
    spark.stop()
  }
}
