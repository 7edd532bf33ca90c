package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiling harness — not part of the contract; rewritten ad hoc
  * each round to localize time inside the slowest declared queries.
  * Round 13: per-query decomposition of PLANNING (analysis + optimization
  * + physical planning, driver-side single-threaded) vs EXECUTION (noop
  * sink), best-of-3 each, mirroring the bench's warm protocol — tells us
  * whether a slow query needs a better plan or a smaller plan.
  * Usage: sbt "runMain graft.ScratchProf q_a,q_b [sfDir]"
  */
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q_corpus_curate_v3"))
    val d = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warm protocol as Bench: JVM/codegen + OS page cache, nothing
    // retained by Spark
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach { n =>
      try Tables.table(spark, d, n)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      var bestPlan = Double.MaxValue
      var bestExec = Double.MaxValue
      var bestAll = Double.MaxValue
      for (_ <- 1 to 3) {
        CacheScope.scoped {
          val t0 = System.nanoTime()
          val df = fn(spark, d)
          df.queryExecution.executedPlan // force analysis→physical plan
          val t1 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          bestPlan = math.min(bestPlan, (t1 - t0) / 1e9)
          bestExec = math.min(bestExec, (t2 - t1) / 1e9)
          bestAll = math.min(bestAll, (t2 - t0) / 1e9)
        }
      }
      println(f"PROF $name%-28s plan $bestPlan%6.3f  exec $bestExec%6.3f  total $bestAll%6.3f")
    }
    spark.stop()
  }
}
