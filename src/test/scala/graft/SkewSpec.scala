package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted transforms must be algebraically identical to the direct form —
  * proven on a deliberately skewed frame (one key holds 90% of rows). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    val hot = (1 to 9000).map(i => ("hot", i.toDouble))
    val cold = (1 to 1000).map(i => (s"k${i % 37}", i.toDouble))
    (hot ++ cold).toDF("k", "v").repartition(8)
  }

  test("saltedCountSum equals direct groupBy aggregation") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,4)")).cast("double").as("sum_v"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedCountSum(skewed, Seq("k"), "v", buckets = 16)
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }

  test("saltedJoin equals direct join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("dk", "label")
    val direct = skewed.join(dim, $"k" === $"dk")
      .groupBy("label").count().orderBy("label").collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", buckets = 8)
      .groupBy("label").count().orderBy("label").collect().toSeq
    assert(salted == direct)
  }

  test("salted partials actually spread a hot group over many buckets") {
    val salted = skewed.withColumn("_salt", Skew.saltExpr(16))
      .filter($"k" === "hot")
      .select("_salt").distinct().count()
    assert(salted > 4, s"hot key only landed in $salted buckets")
  }
}
