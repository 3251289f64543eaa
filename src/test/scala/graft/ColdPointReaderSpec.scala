package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{ColdPointReader, Engine}

/** Cold point-read metadata cache (VERDICT r4 #3): tier files are
  * immutable, so footer stats are parsed once per file and every
  * subsequent lookup prunes on the cached pk min/max — a warm-cache
  * point read opens ONLY the files whose range covers the key, and a
  * miss outside every range opens none (the reference's per-SSTable
  * bloom + sparse-index cache, sstable.hpp).
  */
class ColdPointReaderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def withDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cpr").toString
    try f(dir)
    finally graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("warm cache: lookups open only range-covering files and parse no footers") {
    withDir { dir =>
      // compactTrigger high: keep the three disjoint-range L0 tiers as-is
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      assert(e.sql("CREATE TABLE cp (id BIGINT NOT NULL, v INT)").ok)
      for (t <- 0 until 3) {
        val rows = (t * 1000 + 1 to t * 1000 + 100)
          .map(i => Array[Any](i.toLong, Int.box(i)))
        e.batchPut("cp", rows)
        e.forceFlush("cp")          // one pk-sorted file per tier (coalesce(1))
      }

      ColdPointReader.invalidateCache()
      val footers0 = ColdPointReader.footersParsed.get()
      assert(e.sql("SELECT v FROM cp WHERE id = 50").rows.head.head == "50")
      assert(ColdPointReader.footersParsed.get() > footers0,
        "cold cache must parse footers once")

      // warm cache, key in the middle tier: exactly one file touched
      val footers1 = ColdPointReader.footersParsed.get()
      val opened1  = ColdPointReader.dataFilesOpened.get()
      assert(e.sql("SELECT v FROM cp WHERE id = 1050").rows.head.head == "1050")
      assert(ColdPointReader.footersParsed.get() == footers1,
        "warm cache must not re-parse footers")
      assert(ColdPointReader.dataFilesOpened.get() == opened1 + 1,
        "only the covering tier's file may be opened")

      // key outside every tier's pk range: pruned without any I/O
      val opened2 = ColdPointReader.dataFilesOpened.get()
      assert(e.sql("SELECT v FROM cp WHERE id = 99999").rows.isEmpty)
      assert(ColdPointReader.dataFilesOpened.get() == opened2,
        "a miss outside all ranges must open no files")
    }
  }

  test("evictTiers with a relative dataDir still evicts the row cache") {
    // rowCache keys are fully-qualified (file:/abs/…) while a relative
    // dataDir yields relative coldDirs strings; eviction must normalize
    // both sides or it silently no-ops (ADVICE r6 #1).
    val rel = s"target/graft-reldir-${System.nanoTime}"
    try {
      val e = new Engine(spark, Some(rel), compactTrigger = 100)
      // this test counts FILE OPENS of a repeated statement — the
      // version-keyed result cache would memoize it above this layer
      e.resultCacheEnabled = false
      assert(e.sql("CREATE TABLE rd (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("rd", (1L to 50L).map(i => Array[Any](i, Int.box(i.toInt))))
      e.forceFlush("rd")

      ColdPointReader.invalidateCache()
      e.sql("SELECT v FROM rd WHERE id = 7")              // warm metadata + row cache
      val opened0 = ColdPointReader.dataFilesOpened.get()
      assert(e.sql("SELECT v FROM rd WHERE id = 7").rows.head.head == "7")
      assert(ColdPointReader.dataFilesOpened.get() == opened0,
        "repeat lookup must be row-cache served before eviction")

      val tierDir = e.storeOf("rd").coldDirs.head         // relative path
      assert(!tierDir.startsWith("/"), s"precondition: tier dir is relative ($tierDir)")
      ColdPointReader.evictTiers(Seq(tierDir))

      val opened1 = ColdPointReader.dataFilesOpened.get()
      assert(e.sql("SELECT v FROM rd WHERE id = 7").rows.head.head == "7")
      assert(ColdPointReader.dataFilesOpened.get() > opened1,
        "eviction by the relative dir must drop the qualified row-cache keys")
    } finally graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(rel))
  }

  test("a missing tier dir is probed but never cached (GC race)") {
    // A lookup holding an older coldDirs snapshot can race deferred tier
    // GC and consult a just-deleted dir; caching its empty listing would
    // poison the cache for a path nothing evicts again (ADVICE r6 #2).
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      // the spec mutates coldDirs directly (stale-snapshot stand-in)
      // without bumping the content version — the result cache would
      // legitimately serve the pre-mutation answer
      e.resultCacheEnabled = false
      assert(e.sql("CREATE TABLE gr (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("gr", (1L to 20L).map(i => Array[Any](i, Int.box(i.toInt))))
      e.forceFlush("gr")

      val store = e.storeOf("gr")
      val real  = store.coldDirs.head
      val ghost = real + "-ghost"
      store.coldDirs = Vector(ghost)                      // stale-snapshot stand-in

      ColdPointReader.invalidateCache()
      assert(e.sql("SELECT v FROM gr WHERE id = 5").rows.isEmpty)
      assert(!ColdPointReader.tierCached(ghost),
        "a nonexistent dir's empty listing must not be cached")

      // the path comes alive (re-minted tier): the earlier probe must
      // not have poisoned the cache with Vector.empty
      java.nio.file.Files.move(
        java.nio.file.Paths.get(real), java.nio.file.Paths.get(ghost))
      assert(e.sql("SELECT v FROM gr WHERE id = 5").rows.head.head == "5",
        "a lookup after the dir appears must see its files")
    }
  }

  test("a retired tier dir is never re-cached after eviction") {
    // the insert race: a listing computed concurrently with evictTiers
    // could win the cache insert after the eviction removed the entry;
    // the observable contract is that a dir, once retired, stays
    // uncached — lookups that still hold it in a stale coldDirs
    // snapshot list it fresh instead of reviving dead metadata
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      assert(e.sql("CREATE TABLE rt (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("rt", (1L to 20L).map(i => Array[Any](i, Int.box(i.toInt))))
      e.forceFlush("rt")
      val tierDir = e.storeOf("rt").coldDirs.head

      ColdPointReader.invalidateCache()
      assert(e.sql("SELECT v FROM rt WHERE id = 5").rows.head.head == "5")
      assert(ColdPointReader.tierCached(tierDir), "precondition: live dir caches")

      ColdPointReader.evictTiers(Seq(tierDir))
      assert(!ColdPointReader.tierCached(tierDir))
      // tier files still on disk (deferred GC window): the lookup works
      // by listing fresh, but must not repopulate the cache
      assert(e.sql("SELECT v FROM rt WHERE id = 5").rows.head.head == "5")
      assert(!ColdPointReader.tierCached(tierDir),
        "a retired dir must not re-enter the cache")
    }
  }

  test("newest-first early exit: a shadowed key reads one tier and wins LWW") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      assert(e.sql("CREATE TABLE lw (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("lw", (1L to 50L).map(i => Array[Any](i, Int.box(1))))
      e.forceFlush("lw")
      e.batchPut("lw", Seq(Array[Any](7L, Int.box(2))))  // shadow in a younger tier
      e.forceFlush("lw")

      ColdPointReader.invalidateCache()
      e.sql("SELECT v FROM lw WHERE id = 1")             // warm the metadata cache

      val opened = ColdPointReader.dataFilesOpened.get()
      val rs = e.sql("SELECT v FROM lw WHERE id = 7")
      assert(rs.rows.head.head == "2", "younger tier must win LWW")
      assert(ColdPointReader.dataFilesOpened.get() == opened + 1,
        "early exit on the newest tier containing the key")

      // row cache: the repeat lookup is served without any file I/O
      val opened2 = ColdPointReader.dataFilesOpened.get()
      assert(e.sql("SELECT v FROM lw WHERE id = 7").rows.head.head == "2")
      assert(ColdPointReader.dataFilesOpened.get() == opened2,
        "warm-key repeat must hit the row cache, not the file")
    }
  }
}
