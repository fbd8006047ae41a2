package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CacheScope, Dedup}

/** Pins the deterministic persist lifecycle (VERDICT r3 #1): operator
  * caches exist while the consuming action runs and are gone when the
  * scope closes — no session-lifetime cache leak per operator call.
  */
class CacheScopeSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("persist is live inside the scope and released when it closes") {
    val df = spark.range(100).toDF("v")
    CacheScope.withScope {
      CacheScope.persist(df)
      df.count()
      assert(df.storageLevel != StorageLevel.NONE, "cached during the action")
    }
    assert(df.storageLevel == StorageLevel.NONE, "released after the scope")
  }

  test("scope releases even when the body throws") {
    val df = spark.range(100).toDF("v")
    intercept[RuntimeException] {
      CacheScope.withScope {
        CacheScope.persist(df)
        df.count()
        throw new RuntimeException("boom")
      }
    }
    assert(df.storageLevel == StorageLevel.NONE)
  }

  test("an operator call inside a scope leaves no new persistent RDDs behind") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3} alpha beta gamma delta"))
      .toDF("id", "body")
    val before = spark.sparkContext.getPersistentRDDs.size
    CacheScope.withScope {
      Dedup.minhashLsh(docs, "id", "body", threshold = 0.1).count()
    }
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "minhashLsh's shingle cache must not outlive the scope")
  }

  test("without a scope, persist degrades to caller-owned session cache") {
    val df = spark.range(50).toDF("v")
    CacheScope.persist(df)
    df.count()
    assert(df.storageLevel != StorageLevel.NONE)
    df.unpersist(blocking = true)
  }
}
