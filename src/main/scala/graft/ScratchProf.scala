package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators._

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

    val e = VectorOps.annBuckets(Tables.table(spark, d, "embeddings"),
      planes = 6).select(col("vec_id"), col("bucket"), col("embedding"))
    println("n embeddings = " + e.count())
    val a = e.select(col("vec_id"), col("bucket"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("nb_id"),
      col("bucket").as("bucket_b"), col("embedding").as("eb"))
    val wFast = Window.partitionBy("vec_id")
      .orderBy(desc_nulls_last("fastdot"), asc_nulls_last("nb_id"))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val jSMJ = a.join(b, col("bucket") === col("bucket_b")
        && col("vec_id") =!= col("nb_id"))
      time("pair join SMJ count")(jSMJ.count())
      val jSHJ = a.hint("shuffle_hash").join(b,
        col("bucket") === col("bucket_b") && col("vec_id") =!= col("nb_id"))
      time("pair join SHJ count")(jSHJ.count())
      time("SMJ fastdot top8")(jSMJ
        .withColumn("fastdot", VectorOps.fastDot(spark, "ea", "eb"))
        .select("vec_id", "nb_id", "fastdot")
        .withColumn("_rn", row_number().over(wFast))
        .filter(col("_rn") <= 8).count())
      time("SHJ fastdot top8")(jSHJ
        .withColumn("fastdot", VectorOps.fastDot(spark, "ea", "eb"))
        .select("vec_id", "nb_id", "fastdot")
        .withColumn("_rn", row_number().over(wFast))
        .filter(col("_rn") <= 8).count())
      time("ann full (current)")(
        SparkEntry.queries("q_ann_neighbors")(spark, d).count())
    }
    spark.stop()
  }
}
