package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions._

class RulesSpec extends SparkSpec {

  private def df1(rows: (String, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("name", "value")
  }

  /** Minimal property loop (scalatestplus isn't on the dependency
    * allowlist): deterministic scalacheck generation via fixed seeds. */
  private def forSamples[A](gen: Gen[A], n: Int = 20)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(body)
    }

  test("extract pulls capture group") {
    val out = Converter(df1(("Brand#42", 1.0)), Seq(
      Extract("num", "name", "Brand#(\\d+)", 1)))
    assert(out.select("num").head.getString(0) == "42")
  }

  test("sub replaces all matches") {
    val out = Converter(df1(("banana", 1.0)), Seq(Sub("name", "a", "_")))
    assert(out.select("name").head.getString(0) == "b_n_n_")
  }

  test("set then unset is identity on the schema") {
    val in = df1(("x", 1.0))
    val out = Converter(in, Seq(Set("tmp", lit(7)), Unset("tmp")))
    assert(out.columns.toSeq == in.columns.toSeq)
    assert(out.collect().toSeq == in.collect().toSeq)
  }

  test("lookup maps known keys and defaults unknown") {
    val out = Converter(df1(("a", 1.0), ("z", 2.0)), Seq(
      Lookup("code", "name", Map("a" -> lit(10L)), lit(-1L))))
    assert(out.orderBy("value").select("code").collect()
      .map(_.getLong(0)).toSeq == Seq(10L, -1L))
  }

  test("condition block is first-match-wins with else") {
    val out = Converter(df1(("a", 10.0), ("b", 100.0), ("c", 500.0)), Seq(
      CondBlock(Seq(
        "value < 50" -> Seq(Set("band", lit("low"))),
        "value < 200" -> Seq(Set("band", lit("mid")))),
        Seq(Set("band", lit("high"))))))
    assert(out.orderBy("value").select("band").collect()
      .map(_.getString(0)).toSeq == Seq("low", "mid", "high"))
  }

  test("condition block: a matching branch suppresses the else for " +
      "fields it does not set, and later branches never fire") {
    // branch 1 sets only a; branch 2 sets only b; else sets b.
    val out = Converter(
      df1(("both", 10.0), ("second", 100.0), ("none", 500.0)), Seq(
        CondBlock(Seq(
          "value < 50" -> Seq(Set("a", lit("A1"))),
          "value < 200" -> Seq(Set("b", lit("B2")))),
          Seq(Set("b", lit("BE"))))))
      .orderBy("value").collect()
    // row 1: branch 1 wins -> a=A1, b untouched (null), NOT else
    assert(out(0).getAs[String]("a") == "A1")
    assert(out(0).getAs[String]("b") == null)
    // row 2: branch 2 wins -> b=B2, a untouched
    assert(out(1).getAs[String]("a") == null)
    assert(out(1).getAs[String]("b") == "B2")
    // row 3: else -> b=BE
    assert(out(2).getAs[String]("b") == "BE")
  }

  test("condition DSL compiles whitelisted predicates") {
    val c = ConditionDsl.compile("value > 10 AND name = 'a'",
      scala.collection.Set("value", "name"))
    val n = df1(("a", 20.0), ("a", 5.0), ("b", 20.0)).filter(c).count()
    assert(n == 1)
  }

  test("condition DSL rejects unknown identifiers and side effects") {
    intercept[IllegalArgumentException](
      ConditionDsl.compile("bogus_col > 1", scala.collection.Set("value")))
    intercept[IllegalArgumentException](
      ConditionDsl.compile("java_method('x')", scala.collection.Set("value")))
  }

  test("condition DSL closes the comment/backslash lexer-desync bypass") {
    val fields = scala.collection.Set("a", "value")
    // block comment containing a quote desynchronizes naive literal
    // stripping from Spark's lexer — must be rejected outright
    intercept[IllegalArgumentException](ConditionDsl.compile(
      "a = 1 /*'*/ or java_method(/*'*/'java.lang.System', 'exit') = 'x'",
      fields))
    intercept[IllegalArgumentException](
      ConditionDsl.compile("a = 1 -- anything", fields))
    intercept[IllegalArgumentException](
      ConditionDsl.compile("""a = 'x\' or java_method('y','z') = '""",
        fields))
  }

  test("condition DSL syntax gate is linear, not exponential (ReDoS)") {
    // the old (alt)+ regex took 47 s at 28 chars and doubled per char
    val bomb = "1" * 120 + "!"
    val t0 = System.nanoTime()
    intercept[IllegalArgumentException](
      ConditionDsl.compile(bomb, scala.collection.Set("value")))
    assert((System.nanoTime() - t0) / 1e9 < 2.0,
      "syntax gate must reject pathological input in linear time")
  }

  test("property: sub to a non-matching replacement is idempotent") {
    val gen = Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
    forSamples(gen) { s0 =>
      val once = Converter(df1((s0, 1.0)), Seq(Sub("name", "[aeiou]", "_")))
        .select("name").head.getString(0)
      val twice = Converter(df1((once, 1.0)), Seq(Sub("name", "[aeiou]", "_")))
        .select("name").head.getString(0)
      assert(once == twice, s"input $s0")
    }
  }

  test("property: lookup with a default is total (never null)") {
    val gen = Gen.listOfN(5, Gen.listOfN(4, Gen.alphaChar).map(_.mkString))
    forSamples(gen, n = 10) { keys =>
      val out = Converter(df1(keys.map(k => (k, 0.0)): _*), Seq(
        Lookup("code", "name", Map("q" -> lit(1L)), lit(0L))))
      assert(out.filter(col("code").isNull).count() == 0)
    }
  }
}
