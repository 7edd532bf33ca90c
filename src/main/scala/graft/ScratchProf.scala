package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
object ScratchProf {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PHASE $label%-30s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => try Tables.table(spark, d, n).cache().count() catch { case _: Throwable => () })
    spark.range(100000).selectExpr("sum(id)").collect()
    // dedup_pairs phases
    val docs = Tables.table(spark, d, "documents")
    val base = docs.select(col("doc_id").as("id"), col("text"))
    val signed = MinHash.withSignatures(base, "text", 8)
    time("dp: signatures")(signed.count())
    val banded = signed.select(col("id"), explode(array(MinHash.bandKeys(8, 4): _*)).as("band"))
    time("dp: banded")(banded.count())
    val cands = banded.groupBy("band").agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr("flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids) - i - 1), b -> struct(a AS id_a, b AS id_b))))")).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
    time("dp: candidates")(cands.count())
    time("dp: full")(SparkEntry.queries("q_dedup_pairs")(spark, d).count())
    // ann_neighbors phases
    val e = VectorOps.annBuckets(Tables.table(spark, d, "embeddings"), planes = 6)
      .select(col("vec_id"), col("bucket"), col("embedding"))
    time("ann: buckets")(e.count())
    val a = e.select(col("vec_id"), col("bucket"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("nb_id"), col("bucket").as("bucket_b"), col("embedding").as("eb"))
    val j = a.join(b, col("bucket") === col("bucket_b") && col("vec_id") =!= col("nb_id"))
    time("ann: join count")(j.count())
    val fd = j.withColumn("fastdot", VectorOps.fastDot(spark, "ea", "eb")).select("vec_id","nb_id","fastdot")
    time("ann: +fastdot slim")(fd.count())
    time("ann: full")(SparkEntry.queries("q_ann_neighbors")(spark, d).count())
    spark.stop()
  }
}
