package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Contract pins for the family-lifetime index memo (r9): build-once,
  * supersede-and-release, self-heal. Uses throwaway families so it
  * never collides with the operators' real entries. */
class FamilyIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  /** Distinct tag per build: Dataset.storageLevel (and unpersist) are
    * PLAN-keyed in the CacheManager, so two builds of an identical
    * plan would alias one cache entry and the assertions below would
    * observe the wrong entry. Real family builds re-read a parquet
    * path whose files changed, so their rebuilt plans never alias the
    * superseded entry's data either. */
  private def freshIndex(tag: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.lit
    val df = spark.range(100).toDF("id").withColumn("tag", lit(tag))
      .persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }

  test("same (family, session, fingerprint) builds once and serves the cached relation") {
    var builds = 0
    def get() = graft.functions.FamilyIndex.of("spec-family-a", spark, "fp1") { () =>
      builds += 1; freshIndex(s"a$builds")
    }
    val a = get(); val b = get()
    assert(builds === 1, "second access rebuilt an unchanged index")
    assert(a eq b, "second access served a different object")
    assert(b.storageLevel != StorageLevel.NONE, "served index not cached")
  }

  test("a changed fingerprint supersedes: old blocks released, new index served") {
    var builds = 0
    def get(fp: String) = graft.functions.FamilyIndex.of("spec-family-b", spark, fp) { () =>
      builds += 1; freshIndex(fp)
    }
    val old = get("fp1")
    val next = get("fp2")
    assert(builds === 2, "regenerated fingerprint did not rebuild")
    assert(!(old eq next), "superseded entry still served")
    assert(old.storageLevel == StorageLevel.NONE,
      "superseded index's blocks were not released — the N-regenerations leak")
    assert(next.storageLevel != StorageLevel.NONE)
  }

  test("self-heal: an externally unpersisted index is rebuilt, never served uncached") {
    var builds = 0
    def get() = graft.functions.FamilyIndex.of("spec-family-c", spark, "fp1") { () =>
      builds += 1; freshIndex(s"c$builds")
    }
    val served = get()
    served.unpersist(blocking = true) // simulate a harness clearCache()
    val healed = get()
    assert(builds === 2, "uncached index was served instead of rebuilt")
    assert(healed.storageLevel != StorageLevel.NONE, "healed index not cached")
  }
}
