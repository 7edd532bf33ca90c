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

  test("AQE skew-split fires on the hot-key join WITHOUT salt " +
      "(the runtime complement to the manual rewrites)") {
    // Thresholds scaled to the fixture: a partition is skewed when
    // > factor × median AND > thresholdBytes — production defaults
    // (5×, 256 MB) shrunk so the hot key's partition qualifies here.
    // Broadcast is disabled so the join stays sort-merge: broadcast
    // joins have no skew problem (nothing shuffles on the join key),
    // which is also WHY manual salting still matters — its remaining
    // real-world case is the broadcast-INELIGIBLE fact×fact join with
    // a known-hot key (see the Skew Scaladoc).
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "8KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hot = (1 to 200000).map(i => ("hot", i.toLong))
      val cold = (1 to 2000).map(i => (s"k${i % 37}", i.toLong))
      val fact = (hot ++ cold).toDF("k", "v").repartition(8)
      val other = ((0 to 36).map(i => s"k$i") :+ "hot")
        .map(k => (k, k.length.toLong)).toDF("dk", "w")
      val joined = fact.join(other, $"k" === $"dk")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      val rows = joined.collect()
      assert(rows.head.getLong(0) == 200000L + 2000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
