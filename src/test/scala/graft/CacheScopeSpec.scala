package graft

import graft.CacheScope.ScopedPersist
import org.apache.spark.storage.StorageLevel

/** Lifetime semantics of the per-query cache scope (Bench wraps each
  * timed run in one so within-query persists cannot leak across the
  * 3×300 interleaved bench — the r8 q_basket_pairs 5.17 s vs 2.04 s solo
  * pathology). */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def isCached(ds: org.apache.spark.sql.Dataset[_]): Boolean =
    ds.storageLevel != StorageLevel.NONE

  test("scoped persists release after the block; outside caches survive") {
    val fixture = spark.range(100).toDF("id").persist() // outside any scope
    fixture.count()
    var inner: org.apache.spark.sql.DataFrame = null
    val n = CacheScope.scoped {
      inner = fixture.select(($"id" * 2).as("x")).persistScoped()
      inner.count()
      assert(isCached(inner), "persistScoped must cache inside the scope")
      inner.agg(Map("x" -> "sum")).count()
    }
    assert(n == 1L)
    assert(!isCached(inner), "scope close must unpersist registrations")
    assert(isCached(fixture), "caches made OUTSIDE the scope must survive")
    fixture.unpersist()
  }

  test("no open scope degrades to a plain persist") {
    val df = spark.range(10).toDF("id").persistScoped()
    df.count()
    assert(isCached(df))
    df.unpersist()
  }

  test("nested scopes release only their own registrations") {
    val outerDf = CacheScope.scoped {
      val o = spark.range(50).toDF("id").persistScoped()
      o.count()
      CacheScope.scoped {
        val i = spark.range(20).toDF("id").select(($"id" + 1).as("y"))
          .persistScoped()
        i.count()
        assert(isCached(i))
        // inner scope closes here
      }
      assert(isCached(o), "inner scope must not release the outer's cache")
      o
    }
    assert(!isCached(outerDf))
  }

  test("double-unpersist (builder-internal release + scope close) is benign") {
    CacheScope.scoped {
      val d = spark.range(5).toDF("id").persistScoped()
      d.count()
      d.unpersist(blocking = false) // builder loops already do this
    } // scope close unpersists again — must not throw
  }
}
