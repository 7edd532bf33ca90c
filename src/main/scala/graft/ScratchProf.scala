package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness — not part of the contract; rewritten ad hoc
  * each round to localize time inside the slowest declared queries. */
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
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n =>
      try Tables.table(spark, d, n).cache().count()
      catch { case _: Throwable => () })
    spark.range(100000).selectExpr("sum(id)").collect()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val pairs = time("nearDuplicates")(
        graft.operators.TextDedup.nearDuplicates(
          Tables.table(spark, d, "documents")).select("id_a", "id_b")
          .localCheckpoint())
      val (lbl, rounds) = time("cc")(
        graft.operators.Corpus.connectedComponentsWithRounds(pairs))
      time("cc-collect")(lbl.count())
      println(s"ROUNDS $rounds  pairs ${pairs.count()}")
      lbl.unpersist()
      spark.catalog.clearCache()
      Tables.names.foreach(n =>
        try Tables.table(spark, d, n).cache().count()
        catch { case _: Throwable => () })
    }
    spark.stop()
  }
}
