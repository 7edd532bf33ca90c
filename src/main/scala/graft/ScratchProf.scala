package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness — not part of the contract; rewritten ad hoc
  * each round to localize time inside the slowest declared queries.
  * Round 11: bootstrap_se cost decomposition at sf0.1. */
object ScratchProf {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PHASE $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel("org.apache.spark.sql.execution.WholeStageCodegenExec", org.apache.logging.log4j.Level.INFO)
    org.apache.logging.log4j.core.config.Configurator.setLevel("org.apache.spark.sql.catalyst.expressions.codegen", org.apache.logging.log4j.Level.INFO)
    val ev = Tables.table(spark, d, "events").cache()
    println("EVENTS " + ev.count())
    spark.range(100000).selectExpr("sum(id)").collect()
    for (r <- 1 to 2) {
      println(s"--- round $r")
      time("md5x4 only")(
        ev.filter(col("value").isNotNull)
          .selectExpr("md5(concat('a_', CAST(event_id AS STRING))) h1",
            "md5(concat('b_', CAST(event_id AS STRING))) h2",
            "md5(concat('c_', CAST(event_id AS STRING))) h3",
            "md5(concat('d_', CAST(event_id AS STRING))) h4")
          .selectExpr("max(h1)", "max(h2)", "max(h3)", "max(h4)")
          .collect())
      time("md5x4 + 32 conv chunks")(
        ev.filter(col("value").isNotNull)
          .selectExpr(Seq("event_type",
            "md5(concat('a_', CAST(event_id AS STRING))) h1",
            "md5(concat('b_', CAST(event_id AS STRING))) h2",
            "md5(concat('c_', CAST(event_id AS STRING))) h3",
            "md5(concat('d_', CAST(event_id AS STRING))) h4"): _*)
          .selectExpr(Seq("event_type") ++ (1 to 32).map { b =>
            val src = s"h${(b - 1) / 8 + 1}"
            val pos = ((b - 1) % 8) * 4 + 1
            s"(CAST(conv(substring($src, $pos, 4), 16, 10) AS BIGINT)" +
              s" % 3) w$b"
          }: _*)
          .groupBy("event_type")
          .agg(sum(col("w1")), (2 to 32).map(b => sum(col(s"w$b"))): _*)
          .collect())
      time("full q_stats_bootstrap_se")(
        graft.operators.StatsTests
          .queries("q_stats_bootstrap_se")(spark, d).collect())
    }
    spark.stop()
  }
}
