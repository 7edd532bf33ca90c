package graft

import org.apache.spark.sql.functions._

/** r13 native-expression equivalence pins: the codegen'd
  * [[graft.functions.ByteSumRange]] and [[graft.functions.SimHash16]]
  * must reproduce — bit for bit, including edge arithmetic — the
  * interpreted HOF expressions they replaced in q_multimodal_tar and
  * q_dedup_simhash (the r13 optimization round's two hottest per-row
  * folds). The HOF forms are re-stated here verbatim as the reference.
  */
class ByteOpsSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.GraftFunctions.ensureRegistered(spark)

  /** The exact HOF checksum fold q_multimodal_tar shipped through r12. */
  private val hofTarChecksum =
    "aggregate(transform(sequence(0, 511), i -> CASE WHEN " +
      "i >= 148 AND i < 156 THEN CAST(32 AS BIGINT) ELSE " +
      "CAST(conv(substring(h, 2 * i + 1, 2), 16, 10) AS BIGINT) " +
      "END), CAST(0 AS BIGINT), (acc, x) -> acc + x)"

  /** The exact HOF vote fold q_dedup_simhash shipped through r12. */
  private val hofSimhash =
    "CAST(aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, j) -> " +
      "acc + CASE WHEN aggregate(hs, CAST(0 AS BIGINT), (a2, h) -> " +
      "a2 + 2 * (CAST(floor((instr('0123456789abcdef', " +
      "substring(h, CAST(floor(j/4) AS INT) + 1, 1)) - 1) " +
      "/ pow(2, 3 - j % 4)) AS BIGINT) % 2) - 1) > 0 " +
      "THEN CAST(pow(2, j) AS BIGINT) " +
      "ELSE CAST(0 AS BIGINT) END) AS BIGINT)"

  test("byte_sum_range reproduces the tar HOF checksum on random " +
      "512-byte headers (and clamps out-of-range slices)") {
    val rnd = new scala.util.Random(13)
    val payloads = (1 to 64).map { _ =>
      val b = new Array[Byte](512); rnd.nextBytes(b); b
    }
    val df = payloads.toDF("payload")
      .withColumn("h", hex(col("payload")))
      .withColumn("hof", expr(hofTarChecksum))
      .withColumn("nat", expr(
        "byte_sum_range(payload, 0, 148) " +
          "+ byte_sum_range(payload, 156, 512) + CAST(256 AS BIGINT)"))
    val rows = df.select("hof", "nat").collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // clamping: until beyond length and from below zero behave like the
    // mathematical sum over the intersection with the payload
    val small = Seq(Array[Byte](1, 2, 3)).toDF("payload")
      .select(expr("byte_sum_range(payload, -5, 99)").as("s"),
        expr("byte_sum_range(payload, 2, 2)").as("e"))
      .head()
    assert(small.getLong(0) == 6L && small.getLong(1) == 0L)
  }

  test("simhash16 reproduces the HOF vote fold on fixture documents " +
      "and on adversarial token hashes") {
    val docs = Tables.table(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .withColumn("hs", expr("transform(split(text, ' '), t -> md5(t))"))
      .withColumn("hof", expr(hofSimhash))
      .withColumn("nat", expr("simhash16(hs)"))
    val rows = docs.select("hof", "nat").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // edge arithmetic the HOF form defined implicitly: non-hex chars
    // (instr−1 = −1 path), short strings (nibble 0), a NULL element
    // (poisons every vote → 0), and the empty array
    val edge = Seq(
      Seq("ZZZZ", "00ff"), // non-hex digits
      Seq("ab"), // shorter than 4 chars
      Seq("ffff", "ffff", "0000"), // majority vote
      Seq[String](), // empty
      Seq("f0f0", null), // NULL element
      null // NULL array
    ).toDF("hs")
      .withColumn("hof", expr(hofSimhash))
      .withColumn("nat", expr("simhash16(hs)"))
    edge.select("hof", "nat").collect().foreach { r =>
      val h = if (r.isNullAt(0)) 0L else r.getLong(0)
      assert(h == r.getLong(1), s"edge mismatch: $r")
    }
  }

  /** The exact HOF window fold q_text_mattr shipped through r12 (W
    * spliced). */
  private def hofMattr(w: Int): String =
    s"CAST(CASE WHEN size(toks) >= $w THEN " +
      s"aggregate(transform(sequence(0, size(toks) - $w), " +
      s"i -> size(array_distinct(slice(toks, i + 1, $w)))), " +
      "0, (a, x) -> a + x) " +
      "ELSE size(array_distinct(toks)) END AS BIGINT)"

  test("mattr_sum_distinct reproduces the HOF sliding-window distinct " +
      "sum on fixture documents and on adversarial token arrays") {
    for (w <- Seq(3, 50)) {
      val docs = Tables.table(spark, sf, "documents")
        .filter(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("hof", expr(hofMattr(w)))
        .withColumn("nat", expr(s"mattr_sum_distinct(toks, $w)"))
      docs.select("hof", "nat").collect()
        .foreach(r => assert(r.getLong(0) == r.getLong(1), s"w=$w"))
    }
    // repeats crossing window edges, a null element (array_distinct
    // counts null once), the all-same array, and the shorter-than-W arm
    val edge = Seq(
      Seq("a", "b", "a", "a", "c", "b"),
      Seq("a", null, "a", null, "b"),
      Seq("x", "x", "x", "x"),
      Seq("a", "b")
    ).toDF("toks")
      .withColumn("hof", expr(hofMattr(3)))
      .withColumn("nat", expr("mattr_sum_distinct(toks, 3)"))
    edge.select("hof", "nat").collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1), s"edge: $r"))
  }
}
