package graft.engine

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

/** The session working-set memo's eviction CONTRACT
  * ([[Dedup.memoizedPersisted]]): the LRU bound is sized for two
  * concurrent sfDirs' full working sets (7 keys each — sigs, bench
  * shingles, tfidf-tf, unigram-tf, hh summary, LSH buckets, IVF
  * cells); this spec guards the policy for whoever adds an 8th
  * working set or a 3rd concurrent dir. */
class MemoPolicySpec extends SparkSpec {
  import spark.implicits._

  private def ws(tag: String) =
    Dedup.memoizedPersisted(spark, s"memopolicy|$tag")(
      Seq((tag, 1L)).toDF("k", "n"))

  test("eviction unpersists: cycling past the cap never leaks cache entries") {
    // fill the map with cap+4 distinct working sets; the overflow
    // must leave every evicted DataFrame UNPERSISTED (eviction that
    // forgets to unpersist would pin CacheManager entries for the
    // session's lifetime — exactly the leak the memo exists to stop)
    val dfs = (0 until 20).map(i => ws(s"evict$i"))
    val persisted = dfs.count(_.storageLevel != StorageLevel.NONE)
    assert(persisted <= 16, s"$persisted live entries > cap")
    // the survivors are exactly the most recently used tail
    assert(dfs.takeRight(8).forall(_.storageLevel != StorageLevel.NONE))
    assert(dfs.take(4).forall(_.storageLevel == StorageLevel.NONE))
  }

  test("re-request of an evicted key re-persists (no permanent demotion)") {
    (0 until 20).foreach(i => ws(s"cycle$i"))
    val first = ws("cycle0") // was evicted above — must come back hot
    assert(first.storageLevel != StorageLevel.NONE)
  }

  test("three sfDirs' worth of keys cannot thrash the hot tail") {
    // 3 dirs × 7 keys = 21 > cap 16: verify the policy degrades as an
    // LRU should — the LAST 16 touched stay persisted, so a verify /
    // bench driver iterating dir-by-dir (not interleaving) always
    // finds its CURRENT dir's whole working set hot
    val dirs = Seq("dA", "dB", "dC")
    val byDir = dirs.map { d =>
      d -> (0 until 7).map(i => ws(s"$d|k$i"))
    }.toMap
    // the 16 most recent — all of dB and dC plus dA's tail — are hot
    assert(byDir("dC").forall(_.storageLevel != StorageLevel.NONE))
    assert(byDir("dB").forall(_.storageLevel != StorageLevel.NONE))
    assert(byDir("dA").drop(5).forall(_.storageLevel != StorageLevel.NONE))
    // dA's head was evicted, and evicted means unpersisted, not orphaned
    assert(byDir("dA").take(5).forall(_.storageLevel == StorageLevel.NONE))
  }
}
