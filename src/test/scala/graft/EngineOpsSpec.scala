package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{BulkLoader, Engine}

/** Batch write path (C8), bulk loader (C9), streaming iterator (C7),
  * DML-over-cold pushdown, multi-file compaction, stats (M5), and the
  * concurrent mixed workload (reference test/mt_benchmark_htap.cpp:155-165).
  */
class EngineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def withDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ops").toString
    try f(dir)
    finally graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  // ---- C8: batch ops -------------------------------------------------------

  test("batchPut upserts, batchGet spans hot and cold, batchDel tombstones") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE b (id BIGINT NOT NULL, v INT, s VARCHAR(10))").ok)
      val rows = (1 to 100).map(i => Array[Any](i.toLong, Int.box(i * 10), s"s$i"))
      assert(e.batchPut("b", rows).size == 100)
      assert(e.sql("SELECT COUNT(*) FROM b").rows.head.head == "100")

      // move everything cold, then batch-write a shadowing update
      e.forceFlush("b")
      assert(e.batchPut("b", Seq(Array[Any](7L, Int.box(777), "seven"))).size == 1)

      val got = e.batchGet("b", Seq(7L, 8L, 9999L))
      assert(got.size == 2)                       // 9999 absent
      assert(got(7L)(1) == 777)                   // hot shadows cold
      assert(got(8L)(1) == 80)                    // cold hit via one IN-scan

      assert(e.batchDel("b", Seq(1L, 2L, 3L)) == 3)
      assert(e.sql("SELECT COUNT(*) FROM b").rows.head.head == "97")

      // batch effects survive restart (delta-log durability)
      val e2 = new Engine(spark, Some(dir))
      assert(e2.sql("SELECT COUNT(*) FROM b").rows.head.head == "97")
      assert(e2.sql("SELECT v FROM b WHERE id = 7").rows.head.head == "777")
    }
  }

  test("batchPut validates arity and NOT NULL") {
    val e = new Engine(spark)
    assert(e.sql("CREATE TABLE bv (id BIGINT NOT NULL, v INT)").ok)
    intercept[graft.engine.EngineException] {
      e.batchPut("bv", Seq(Array[Any](1L)))
    }
    intercept[graft.engine.EngineException] {
      e.batchPut("bv", Seq(Array[Any](null, Int.box(1))))
    }
  }

  // ---- C9: bulk loader -----------------------------------------------------

  test("bulk loader inserts seeded rows deterministically and fast") {
    val e = new Engine(spark)
    val t0 = System.nanoTime()
    assert(BulkLoader.load(e, n = 100000) == 100000L)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"bulk load of 100k rows took $secs s")
    assert(e.sql("SELECT COUNT(*) FROM transactions").rows.head.head == "100000")
    // deterministic: same seed → same content on a fresh engine
    val e2 = new Engine(spark)
    BulkLoader.load(e2, n = 1000)
    val a = e.batchGet("transactions", Seq(500)).apply(500).toVector
    val b = e2.batchGet("transactions", Seq(500)).apply(500).toVector
    assert(a == b)
  }

  // ---- C7: streaming iterator ----------------------------------------------

  test("scanIterator streams the snapshot incrementally") {
    val e = new Engine(spark)
    assert(e.sql("CREATE TABLE it (id BIGINT NOT NULL, v INT)").ok)
    val rows = (1 to 500).map(i => Array[Any](i.toLong, Int.box(i)))
    e.batchPut("it", rows)
    val it = e.scanIterator("it")
    assert(it.take(10).size == 10)            // partial consumption works
    assert(e.scanIterator("it").size == 500)  // full drain sees every row
  }

  // ---- DML over cold tiers -------------------------------------------------

  test("UPDATE/DELETE on a flushed table pushes the predicate into the scan") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE dml (id BIGINT NOT NULL, grp VARCHAR(5), v INT)").ok)
      e.batchPut("dml", (1 to 1000).map(i =>
        Array[Any](i.toLong, if (i % 2 == 0) "even" else "odd", Int.box(i))))
      e.forceFlush("dml")
      // point update against cold data
      assert(e.sql("UPDATE dml SET v = 42 WHERE id = 500").rowsAffected == 1)
      assert(e.sql("SELECT v FROM dml WHERE id = 500").rows.head.head == "42")
      // predicate update touches exactly the matching cold rows
      assert(e.sql("UPDATE dml SET v = 0 WHERE grp = 'odd'").rowsAffected == 500)
      assert(e.sql("SELECT SUM(v) FROM dml WHERE grp = 'odd'").rows.head.head == "0")
      // delete by range over cold
      assert(e.sql("DELETE FROM dml WHERE id > 900").rowsAffected == 100)
      assert(e.sql("SELECT COUNT(*) FROM dml").rows.head.head == "900")
    }
  }

  test("broad UPDATE/DELETE stream matches in bounded batches, results unchanged") {
    withDir { dir =>
      // 10k matching rows > 2 dmlBatchRows batches: the statement must
      // apply across several putBatch drains (bounded driver pull, one
      // fsync per batch) and still mutate every matching row exactly
      // once — snapshot-at-start semantics, no feedback from the
      // statement's own writes into its match set.
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE bdml (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("bdml", (1 to 10000).map(i => Array[Any](i.toLong, Int.box(i))))
      e.forceFlush("bdml")
      assert(e.sql("UPDATE bdml SET v = 7 WHERE v >= 1").rowsAffected == 10000)
      assert(e.sql("SELECT SUM(v) FROM bdml").rows.head.head == "70000")
      assert(e.sql("SELECT COUNT(*) FROM bdml").rows.head.head == "10000")
      // broad delete over the mixed hot(+updated)/cold state
      assert(e.sql("DELETE FROM bdml WHERE id <= 9000").rowsAffected == 9000)
      assert(e.sql("SELECT COUNT(*) FROM bdml").rows.head.head == "1000")
      // durable across restart
      val e2 = new Engine(spark, Some(dir))
      assert(e2.sql("SELECT COUNT(*) FROM bdml").rows.head.head == "1000")
      assert(e2.sql("SELECT SUM(v) FROM bdml").rows.head.head == "7000")
    }
  }

  test("broad UPDATE flushing mid-statement never compacts away its own inputs") {
    withDir { dir =>
      // hotLimit 500 forces a flush on every 4096-row DML drain: the
      // statement's own writes land as NEW tiers while its match
      // iterator is still scanning the original cold files — flushes
      // mid-statement must not trigger compaction (which would retire
      // and eventually delete those files); the deferred single pass
      // afterwards reclaims the tier pileup
      val e = new Engine(spark, Some(dir), hotLimit = 500)
      assert(e.sql("CREATE TABLE mdml (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("mdml", (1 to 20000).map(i => Array[Any](i.toLong, Int.box(1))))
      e.forceFlush("mdml")
      val tiersBefore = e.stats.tables.find(_.name == "mdml").get.coldTiers
      assert(e.sql("UPDATE mdml SET v = 2 WHERE v = 1").rowsAffected == 20000)
      assert(e.sql("SELECT SUM(v) FROM mdml").rows.head.head == "40000")
      assert(e.sql("SELECT COUNT(*) FROM mdml").rows.head.head == "20000")
      // the statement flushed multiple times (tier churn happened) and
      // the post-statement compaction pass merged the L0 pileup
      val st = e.stats
      assert(st.totalCompactions >= 1, s"expected the deferred compaction pass, got $st")
      val tiersAfter = st.tables.find(_.name == "mdml").get.coldTiers
      assert(tiersAfter < tiersBefore + 5,
        s"tier pileup not reclaimed: $tiersBefore -> $tiersAfter")
    }
  }

  // ---- compaction writes multiple files, snapshot invariant ----------------

  test("compaction output is multi-file capable and snapshot-invariant") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 99)
      assert(e.sql("CREATE TABLE mc (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("mc", (1 to 300).map(i => Array[Any](i.toLong, Int.box(i))))
      e.forceFlush("mc")
      e.batchPut("mc", (200 to 400).map(i => Array[Any](i.toLong, Int.box(i * 2))))
      e.forceFlush("mc")
      val before = e.sql("SELECT SUM(v) FROM mc").rows.head.head
      e.compact("mc")
      assert(e.sql("SELECT SUM(v) FROM mc").rows.head.head == before)
      assert(e.sql("SELECT COUNT(*) FROM mc").rows.head.head == "400")
      assert(e.sql("SELECT v FROM mc WHERE id = 250").rows.head.head == "500")
      // restart over the compacted multi-file tier
      val e2 = new Engine(spark, Some(dir))
      assert(e2.sql("SELECT COUNT(*) FROM mc").rows.head.head == "400")
    }
  }

  test("pause defers compaction jobs; resume drains them") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 2)
      assert(e.sql("CREATE TABLE pz (id BIGINT NOT NULL, v INT)").ok)
      e.pauseCompaction()
      // four L0 flushes — double the trigger. With the scheduler live
      // these would leveled-merge; paused, they must only accumulate.
      (0 until 4).foreach { t =>
        e.batchPut("pz", (1 to 200).map(i => Array[Any](t * 1000L + i, Int.box(i))))
        e.forceFlush("pz")
      }
      val store = e.storeOf("pz")
      assert(store.synchronized(store.coldDirs).size == 4,
        "paused scheduler must not merge L0 tiers")
      assert(e.pendingCompactions >= 1, "deferred leveled pass not recorded")
      // admin major while paused: deferred too (reference enqueues the
      // job; the paused worker just doesn't consume it)
      e.compact("pz")
      assert(store.synchronized(store.coldDirs).size == 4,
        "paused scheduler must not run an admin major")
      val before = e.sql("SELECT COUNT(*) FROM pz").rows.head.head
      e.resumeCompaction()
      // the drain runs the deferred major: all four tiers collapse
      assert(store.synchronized(store.coldDirs).size == 1,
        s"resume did not drain the deferred major: ${store.synchronized(store.coldDirs)}")
      assert(e.pendingCompactions == 0)
      assert(e.sql("SELECT COUNT(*) FROM pz").rows.head.head == before)
      // post-resume triggers behave normally again (no lingering pause)
      assert(!e.compactionIsPaused)
    }
  }

  // ---- full Spark SQL over snapshots ---------------------------------------

  test("writes proceed while a compaction merge runs (non-blocking compaction)") {
    withDir { dir =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE nb (id BIGINT NOT NULL, v INT, s VARCHAR(64))").ok)
      // three cold tiers big enough that the major merge is a real
      // multi-hundred-ms Spark job (3 stays under the L0 trigger, so
      // the merge start is OURS to schedule)
      (0 until 3).foreach { t =>
        val rows = (1 to 20000).map(i =>
          Array[Any]((t * 20000L + i), Int.box(i), "x" * 40))
        e.batchPut("nb", rows)
        e.forceFlush("nb")
      }
      val merge = Future(e.compact("nb"))
      // while the merge runs, single-row writes must not stall on the
      // store lock (pre-r8 the merge job ran INSIDE it)
      var maxPutNanos = 0L
      var written = 0
      var flushedDuringMerge = false
      while (!merge.isCompleted && written < 2000) {
        val t0 = System.nanoTime()
        e.batchPut("nb", Seq(Array[Any](1000000L + written, Int.box(written), "y")))
        maxPutNanos = math.max(maxPutNanos, System.nanoTime() - t0)
        written += 1
        // once some timed puts exist, land a whole NEW TIER mid-merge:
        // the swap must keep it (it is strictly newer than the merge's
        // captured inputs)
        if (written == 25 && !merge.isCompleted) {
          e.forceFlush("nb"); flushedDuringMerge = true
        }
        Thread.sleep(1)
      }
      Await.result(merge, 120.seconds)
      info(f"puts during merge: $written (max ${maxPutNanos / 1e6}%.1f ms, " +
        s"mid-merge flush: $flushedDuringMerge)")
      assert(written > 0, "merge completed before any concurrent put was attempted")
      assert(maxPutNanos < 500L * 1000 * 1000,
        f"a put stalled ${maxPutNanos / 1e6}%.0f ms while the merge ran")
      // nothing lost: base rows and every mid-merge write survive the swap
      assert(e.sql("SELECT COUNT(*) FROM nb").rows.head.head == (60000 + written).toString)
      assert(e.sql("SELECT v FROM nb WHERE id = 1000000").rows.head.head == "0")
      // and the merged state survives restart (manifest consistency)
      val e2 = new Engine(spark, Some(dir))
      assert(e2.sql("SELECT COUNT(*) FROM nb").rows.head.head == (60000 + written).toString)
    }
  }

  test("scan lease defers retired-tier deletion until the iterator drains") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 99) // manual compaction only
      assert(e.sql("CREATE TABLE lease (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("lease", (1 to 5000).map(i => Array[Any](i.toLong, Int.box(i))))
      e.forceFlush("lease")
      val store = e.storeOf("lease")
      val originalTiers = store.synchronized(store.coldDirs)
      val it = e.scanIterator("lease")
      (1 to 100).foreach(_ => it.next())   // live scan, not exhausted
      // three majors: past the 2-generation cushion the first batch's
      // files would be DELETED mid-scan were it not for the lease
      (0 until 3).foreach { i =>
        e.batchPut("lease", Seq(Array[Any]((10000 + i).toLong, Int.box(i))))
        e.forceFlush("lease")
        e.compact("lease")
      }
      assert(originalTiers.forall(p =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
        "retired tiers deleted while a scan lease was live")
      var n = 100
      while (it.hasNext) { it.next(); n += 1 }
      assert(n == 5000)
      // exhaustion releases the lease and drains the deferred queue
      assert(originalTiers.exists(p =>
        !java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
        "deferred tier GC did not run after the scan drained")
    }
  }

  test("abandoned scan lease cannot pin retired tiers past the deferred-queue cap") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 99)
      assert(e.sql("CREATE TABLE aband (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("aband", (1 to 200).map(i => Array[Any](i.toLong, Int.box(i))))
      e.forceFlush("aband")
      val store = e.storeOf("aband")
      val originalTiers = store.synchronized(store.coldDirs)
      // a live iterator holding the lease, pulled once per churn cycle:
      // an ACTIVE slow consumer, not an abandoned one
      val it = e.scanIterator("aband")
      it.next()
      // churn past maxDeferredGens (16): each cycle retires one
      // generation. Because the consumer keeps pulling (lastScanPull
      // stays fresh), the cap must NOT breach — an active slow scan
      // keeps its plan-time files even past the depth limit
      (0 until 18).foreach { i =>
        e.batchPut("aband", Seq(Array[Any]((1000 + i).toLong, Int.box(i))))
        e.forceFlush("aband")
        e.compact("aband")
        it.next() // keep the lease visibly live
      }
      assert(store.synchronized(store.retiredGens.size) > 16,
        s"active consumer's generations were reclaimed: ${store.synchronized(store.retiredGens.size)}")
      assert(originalTiers.forall(p =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
        "an actively-pulling scan lost its plan-time tier files")
      // now ABANDON it: stop pulling and age the pull clock past the
      // idle threshold — the next trim must reclaim down to the cap,
      // bounding disk growth under a leaked lease
      store.lastScanPull.set(System.nanoTime() - (e.leaseIdleBreachMs + 1000) * 1000000L)
      e.batchPut("aband", Seq(Array[Any](2000L, Int.box(0))))
      e.forceFlush("aband")
      e.compact("aband")
      assert(store.synchronized(store.retiredGens.size) <= 16,
        s"deferred queue grew past the cap: ${store.synchronized(store.retiredGens.size)}")
      assert(originalTiers.exists(p =>
        !java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
        "idle-lease cap breach did not reclaim the oldest retired generation")
      assert(e.sql("SELECT COUNT(*) FROM aband").rows.head.head == "219")
    }
  }

  test("a single pull blocked past the idle threshold still pins its tier files") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 99)
      assert(e.sql("CREATE TABLE blkp (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("blkp", (1 to 200).map(i => Array[Any](i.toLong, Int.box(i))))
      e.forceFlush("blkp")
      val store = e.storeOf("blkp")
      val originalTiers = store.synchronized(store.coldDirs)
      val it = e.scanIterator("blkp")
      it.next()
      // simulate ONE pull that blocks longer than the idle threshold
      // (a slow downstream consumer mid-fetch): the pre-pull timestamp
      // is stale, but the in-flight counter must keep the lease LIVE —
      // trusting lastScanPull alone would let trimRetired delete tier
      // files the blocked plan still references
      store.lastScanPull.set(System.nanoTime() - (e.leaseIdleBreachMs + 1000) * 1000000L)
      store.inFlightPulls.incrementAndGet()
      try {
        (0 until 18).foreach { i =>
          e.batchPut("blkp", Seq(Array[Any]((1000 + i).toLong, Int.box(i))))
          e.forceFlush("blkp")
          e.compact("blkp")
        }
        assert(originalTiers.forall(p =>
          java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
          "a blocked in-flight pull lost its plan-time tier files")
      } finally store.inFlightPulls.decrementAndGet()
      // pull returns (counter back to zero, stamp still stale): the
      // abandoned-lease cap breach applies again
      store.lastScanPull.set(System.nanoTime() - (e.leaseIdleBreachMs + 1000) * 1000000L)
      e.batchPut("blkp", Seq(Array[Any](2000L, Int.box(0))))
      e.forceFlush("blkp")
      e.compact("blkp")
      assert(store.synchronized(store.retiredGens.size) <= 16,
        s"deferred queue grew past the cap: ${store.synchronized(store.retiredGens.size)}")
    }
  }

  test("resume drain survives a busy store: the failed major is re-deferred, not lost") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 99, adminCompactWaitMs = 200L)
      assert(e.sql("CREATE TABLE rdf (id BIGINT NOT NULL, v INT)").ok)
      (0 until 3).foreach { t =>
        e.batchPut("rdf", (1 to 100).map(i => Array[Any](t * 1000L + i, Int.box(i))))
        e.forceFlush("rdf")
      }
      e.pauseCompaction()
      e.compact("rdf")                       // deferred admin major
      assert(e.pendingCompactions == 1)
      val store = e.storeOf("rdf")
      // wedge the per-store pass guard: the drained major times out
      // busy (bounded by adminCompactWaitMs) instead of running
      store.compacting.set(true)
      try {
        e.resumeCompaction()                 // must not throw
        assert(!e.compactionIsPaused)
        assert(e.pendingCompactions == 1,
          "busy-failed major was dropped from the deferred queue")
        assert(store.synchronized(store.coldDirs).size == 3,
          "wedged store was compacted anyway")
      } finally store.compacting.set(false)
      // guard released: the re-deferred major drains on the next resume
      e.resumeCompaction()
      assert(e.pendingCompactions == 0)
      assert(store.synchronized(store.coldDirs).size == 1,
        s"re-deferred major did not drain: ${store.synchronized(store.coldDirs)}")
      assert(e.sql("SELECT COUNT(*) FROM rdf").rows.head.head == "300")
    }
  }

  test("chaos: concurrent writers, flusher, compactor, and reader stay consistent") {
    withDir { dir =>
      // every r8 concurrency surface at once: unlocked leveled merges
      // (flush-triggered), serialized admin majors, swap staleness
      // re-checks, deferred tier GC — under 3 writers with DISJOINT
      // key ranges (each thread is sequential over its own keys, so
      // the engine's per-key LWW order must equal each thread's
      // program order, making the final state exactly checkable)
      val e = new Engine(spark, Some(dir), hotLimit = 2000, compactTrigger = 3)
      assert(e.sql("CREATE TABLE chaos (id BIGINT NOT NULL, v BIGINT)").ok)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def guard(f: => Unit): Unit =
        try f catch { case t: Throwable => errs.add(t); stop.set(true) }
      val lastWritten = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
      val writers = (0 until 3).map { w =>
        new Thread(() => {
          val rng = new scala.util.Random(42 + w)
          var it = 0L
          while (!stop.get()) {
            val batch = (0 until 50).map { _ =>
              val k = w * 100000L + rng.nextInt(3000)
              lastWritten.put(k, it)
              Array[Any](k, Long.box(it))
            }
            guard(e.batchPut("chaos", batch))
            it += 1
          }
        })
      }
      val flusher = new Thread(() => while (!stop.get()) {
        guard(e.forceFlush("chaos")); Thread.sleep(25)
      })
      val compactor = new Thread(() => while (!stop.get()) {
        guard(e.compact("chaos")); Thread.sleep(250)
      })
      val reader = new Thread(() => while (!stop.get()) {
        guard(assert(e.sql("SELECT COUNT(*) FROM chaos").ok)); Thread.sleep(50)
      })
      // r9 surface: the pause/resume admin toggles WHILE writers,
      // flusher, admin majors, and readers run — deferred jobs must
      // drain on resume without ever corrupting state or deadlocking
      // against the per-store pass guard
      val pauser = new Thread(() => while (!stop.get()) {
        guard { e.pauseCompaction(); Thread.sleep(150); e.resumeCompaction() }
        Thread.sleep(200)
      })
      val all = writers ++ Seq(flusher, compactor, reader, pauser)
      all.foreach(_.start())
      Thread.sleep(2500)
      stop.set(true)
      all.foreach(_.join())
      assert(errs.isEmpty, s"concurrent op failed: ${errs.peek()}")
      e.resumeCompaction()        // drain anything deferred at stop time
      // final state: a sample of keys holds each owner-thread's last
      // value, and the table holds exactly the distinct written keys
      import scala.jdk.CollectionConverters._
      val keys = lastWritten.keySet.asScala.toVector.sorted
      val sample = keys.take(200) ++ keys.takeRight(200)
      val got = e.batchGet("chaos", sample.map(k => k: Any))
      sample.foreach { k =>
        assert(got.contains(k), s"key $k lost")
        assert(got(k)(1) == lastWritten.get(k),
          s"key $k: got ${got(k)(1)}, last written ${lastWritten.get(k)}")
      }
      assert(e.sql("SELECT COUNT(*) FROM chaos").rows.head.head == keys.size.toString)
      // and the whole state survives restart (manifest + delta replay)
      val e2 = new Engine(spark, Some(dir))
      assert(e2.sql("SELECT COUNT(*) FROM chaos").rows.head.head == keys.size.toString)
    }
  }

  test("sparkSql runs joins and group-bys across live hot+cold snapshots") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE cust (id BIGINT NOT NULL, name VARCHAR(50))").ok)
      assert(e.sql("CREATE TABLE ords (oid BIGINT NOT NULL, cid BIGINT, amount DOUBLE)").ok)
      (1 to 5).foreach(i => assert(e.sql(s"INSERT INTO cust VALUES ($i, 'c$i')").ok))
      e.forceFlush("cust") // one side cold, one side hot
      (1 to 20).foreach(i => assert(e.sql(s"INSERT INTO ords VALUES ($i, ${i % 5 + 1}, ${i * 10}.0)").ok))
      val rows = e.sparkSql(
        """SELECT c.name, count(*) AS n, sum(o.amount) AS total
           FROM ords o JOIN cust c ON o.cid = c.id
           GROUP BY c.name ORDER BY c.name""").collect()
      assert(rows.length == 5)
      assert(rows.map(_.getLong(1)).sum == 20)
      // freshness: a hot update is visible to the next sparkSql call
      assert(e.sql("UPDATE cust SET name = 'renamed' WHERE id = 1").rowsAffected == 1)
      assert(e.sparkSql("SELECT name FROM cust WHERE id = 1").collect()(0).getString(0) == "renamed")
    }
  }

  test("sparkSql registers only the views a statement references") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      val names = (0 until 50).map(i => s"svr17_t$i")
      names.foreach { n =>
        assert(e.sql(s"CREATE TABLE $n (id BIGINT NOT NULL, v INT)").ok)
        e.batchPut(n, Seq(Array[Any](1L, Int.box(1))))
      }
      try {
        // a 1-table statement on a 50-table engine must register (and
        // therefore snapshot-build) exactly the referenced table —
        // temp-view existence is the faithful proxy: sparkSql builds a
        // snapshot iff it registers the view
        assert(e.sparkSql(s"SELECT count(*) AS n FROM svr17_t3")
          .collect()(0).getLong(0) == 1L)
        assert(spark.catalog.tableExists("svr17_t3"))
        assert(!spark.catalog.tableExists("svr17_t4"),
          "sparkSql built a snapshot for a table the query never references")
        // multi-table statements register each referenced table
        assert(e.sparkSql(
          "SELECT count(*) AS n FROM svr17_t5 JOIN svr17_t6 ON svr17_t5.id = svr17_t6.id")
          .collect()(0).getLong(0) == 1L)
        assert(spark.catalog.tableExists("svr17_t5") &&
          spark.catalog.tableExists("svr17_t6"))
        assert(!spark.catalog.tableExists("svr17_t7"))
        // zero matches (no table name in the text) falls back to
        // registering everything — never TABLE_OR_VIEW_NOT_FOUND for
        // a spelling the word-boundary heuristic misses
        assert(e.sparkSql("SELECT 1 AS one").collect()(0).getInt(0) == 1)
        assert(names.forall(spark.catalog.tableExists),
          "zero-match fallback must register every table")
        // freshness is untouched: a write is visible to the next call
        e.batchPut("svr17_t3", Seq(Array[Any](2L, Int.box(2))))
        assert(e.sparkSql("SELECT count(*) AS n FROM svr17_t3")
          .collect()(0).getLong(0) == 2L)
      } finally names.foreach(n => e.sql(s"DROP TABLE $n"))
    }
  }

  test("sparkSql: a non-literal table reference never reads a stale view (r18)") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE nlit_a (id BIGINT NOT NULL, v INT)").ok)
      assert(e.sql("CREATE TABLE nlit_b (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("nlit_a", Seq(Array[Any](1L, Int.box(1))))
      e.batchPut("nlit_b", Seq(Array[Any](1L, Int.box(10))))
      try {
        // register nlit_b's temp view via a literal reference
        assert(e.sparkSql("SELECT count(*) AS n FROM nlit_b")
          .collect()(0).getLong(0) == 1L)
        // write to b, then reference b only NON-literally while a is
        // literal: the word-boundary heuristic registers a, skips the
        // zero-match fallback, and pre-r18 the IDENTIFIER spelling
        // resolved against the STALE nlit_b view registered above —
        // now the unrefreshed view is dropped and the analysis retry
        // registers a fresh snapshot
        e.batchPut("nlit_b", Seq(Array[Any](2L, Int.box(20))))
        val n = e.sparkSql(
          "SELECT count(*) AS n FROM nlit_a JOIN IDENTIFIER('nlit' || '_b') ON true")
          .collect()(0).getLong(0)
        assert(n == 2L, "a non-literal table reference must read a FRESH snapshot")
      } finally { e.sql("DROP TABLE nlit_a"); e.sql("DROP TABLE nlit_b") }
    }
  }

  // ---- C13: delta-log corruption recovery ----------------------------------

  test("explainSpark reports per-table tier feed plus the Catalyst physical plan") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE ex (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("ex", (1 to 100).map(i => Array[Any](i.toLong, Int.box(i))))
      e.forceFlush("ex")
      e.batchPut("ex", Seq(Array[Any](101L, Int.box(1))))
      val plan = e.explainSpark("SELECT COUNT(*) AS n FROM ex")
      assert(plan.contains("ex: hot rows 1, cold tiers 1"), plan)
      assert(plan.contains("L0 x1") && plan.contains("~100 rows cold"), plan)
      assert(plan.contains("Physical Plan"), plan)
    }
  }

  test("recovery skips a corrupt delta-log tail, keeping the intact prefix") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE cr (id BIGINT NOT NULL, v INT)").ok)
      (1 to 10).foreach(i => assert(e.sql(s"INSERT INTO cr VALUES ($i, $i)").ok))
      // simulate a torn write: garbage appended after the last record
      val log = java.nio.file.Paths.get(dir, "delta", "cr.log")
      java.nio.file.Files.write(log, Array[Byte](0, 0, 0, 42, 7, 7, 7),
        java.nio.file.StandardOpenOption.APPEND)
      val e2 = new Engine(spark, Some(dir))
      assert(e2.sql("SELECT COUNT(*) FROM cr").rows.head.head == "10")
      assert(e2.sql("SELECT v FROM cr WHERE id = 7").rows.head.head == "7")
      // the recovered engine keeps accepting writes with fresh seqs
      assert(e2.sql("INSERT INTO cr VALUES (11, 11)").ok)
      assert(e2.sql("SELECT COUNT(*) FROM cr").rows.head.head == "11")
      // recovery truncated the torn tail, so post-recovery writes are
      // NOT stranded behind garbage on the next restart
      val e3 = new Engine(spark, Some(dir))
      assert(e3.sql("SELECT COUNT(*) FROM cr").rows.head.head == "11")
      assert(e3.sql("SELECT v FROM cr WHERE id = 11").rows.head.head == "11")
      // the unreadable tail was preserved for offline repair
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "delta", "cr.log.corrupt")))
    }
  }

  test("recovery survives garbage that decodes to a negative/huge length") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE cg (id BIGINT NOT NULL, v INT)").ok)
      (1 to 5).foreach(i => assert(e.sql(s"INSERT INTO cg VALUES ($i, $i)").ok))
      val log = java.nio.file.Paths.get(dir, "delta", "cg.log")
      // 0xFFFFFFFF reads as length -1; 0x7FFFFF00 as a ~2GB allocation
      java.nio.file.Files.write(log,
        Array[Byte](-1, -1, -1, -1, 0x7f, -1, -1, 0, 1, 2, 3),
        java.nio.file.StandardOpenOption.APPEND)
      val e2 = new Engine(spark, Some(dir))
      assert(e2.sql("SELECT COUNT(*) FROM cg").rows.head.head == "5")
      assert(e2.sql("INSERT INTO cg VALUES (6, 6)").ok)
      val e3 = new Engine(spark, Some(dir))
      assert(e3.sql("SELECT COUNT(*) FROM cg").rows.head.head == "6")
    }
  }

  test("cold point lookup reads tiers directly (LWW across hot, cold, tombstones)") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE cp (id BIGINT NOT NULL, name VARCHAR(50), amount DOUBLE)").ok)
      (1 to 10).foreach(i => assert(e.sql(s"INSERT INTO cp VALUES ($i, 'n$i', $i.5)").ok))
      e.forceFlush("cp")
      // cold hit through the direct parquet reader (no Spark scan path)
      assert(e.sql("SELECT name FROM cp WHERE id = 7").rows == Vector(Vector("n7")))
      // a hot version strictly shadows the flushed one
      assert(e.sql("UPDATE cp SET name = 'hot' WHERE id = 7").rowsAffected == 1)
      assert(e.sql("SELECT name FROM cp WHERE id = 7").rows == Vector(Vector("hot")))
      // across MULTIPLE tiers the highest __seq wins
      e.forceFlush("cp")
      assert(e.sql("SELECT name FROM cp WHERE id = 7").rows == Vector(Vector("hot")))
      // a tombstone hides the key, hot or flushed
      assert(e.sql("DELETE FROM cp WHERE id = 3").rowsAffected == 1)
      assert(e.sql("SELECT * FROM cp WHERE id = 3").rowCount == 0)
      e.forceFlush("cp")
      assert(e.sql("SELECT * FROM cp WHERE id = 3").rowCount == 0)
      assert(e.sql("SELECT * FROM cp WHERE id = 99").rowCount == 0)
    }
  }

  test("cold point lookup works for string pks") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE cps (k VARCHAR(20) NOT NULL, v INT)").ok)
      Seq("alpha" -> 1, "beta" -> 2, "gamma" -> 3).foreach { case (k, v) =>
        assert(e.sql(s"INSERT INTO cps VALUES ('$k', $v)").ok)
      }
      e.forceFlush("cps")
      assert(e.sql("SELECT v FROM cps WHERE k = 'beta'").rows == Vector(Vector("2")))
      assert(e.sql("SELECT v FROM cps WHERE k = 'nope'").rowCount == 0)
    }
  }

  test("loadFrom ingests any Spark source (CSV here) through the batch path") {
    import graft.engine.BulkLoader
    val e = new Engine(spark)
    assert(e.sql("CREATE TABLE ld (id BIGINT NOT NULL, name VARCHAR(50), amount DOUBLE)").ok)
    val csv = java.nio.file.Files.createTempDirectory("graft-csv")
    java.nio.file.Files.writeString(csv.resolve("data.csv"),
      "id,name,amount\n1,a,1.5\n2,b,2.5\n3,c,3.5\n")
    val df = spark.read.option("header", "true").csv(csv.toString)
    assert(BulkLoader.loadFrom(e, "ld", df) == 3)
    assert(e.sql("SELECT COUNT(*) FROM ld").rows.head.head == "3")
    // string CSV values were cast to the table's declared types
    assert(e.sql("SELECT amount FROM ld WHERE id = 2").rows.head.head == "2.5")
    graft.engine.Persist.deleteRecursively(csv)
  }

  test("loadFrom ingests TIMESTAMP and TIMESTAMP_NTZ sources into the int64 TIMESTAMP column") {
    import graft.engine.BulkLoader
    import org.apache.spark.sql.functions._
    val e = new Engine(spark)
    assert(e.sql("CREATE TABLE lt (id BIGINT NOT NULL, ts TIMESTAMP)").ok)
    // NTZ is what the footer-aware events loader surfaces for MICROS
    // files — the NTZ->BIGINT cast fails analysis without the
    // TIMESTAMP hop (found loading the 10x events table, r15)
    import spark.implicits._
    val df = Seq((1L, "2026-01-01 00:00:00"), (2L, "2026-01-01 01:00:00"))
      .toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp_ntz").as("ts"))
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    assert(BulkLoader.loadFrom(e, "lt", df) == 2)
    // UTC session: wall time 2026-01-01T00:00 == epoch 1767225600 s
    assert(e.sql("SELECT ts FROM lt WHERE id = 1").rows.head.head == "1767225600")
    // plain TIMESTAMP (LTZ) sources upsert through the same path
    val df2 = Seq((3L, "2026-01-01 02:00:00")).toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp").as("ts"))
    assert(BulkLoader.loadFrom(e, "lt", df2) == 1)
    assert(e.sql("SELECT COUNT(*) FROM lt").rows.head.head == "3")
  }

  test("recovery reports truncated bytes; checkpoint snapshots the log") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE rr (id BIGINT NOT NULL, v INT)").ok)
      (1 to 10).foreach(i => assert(e.sql(s"INSERT INTO rr VALUES ($i, $i)").ok))
      val log = java.nio.file.Paths.get(dir, "delta", "rr.log")
      java.nio.file.Files.write(log, Array[Byte](0, 0, 0, 42, 7, 7, 7),
        java.nio.file.StandardOpenOption.APPEND)
      // an operator can now SEE the loss instead of silent truncation
      val e2 = new Engine(spark, Some(dir))
      val rec = e2.storeOf("rr").delta.get.lastRecovery
      assert(rec.contains(graft.engine.DeltaLog.Recovery(10, 7L)), s"got $rec")
      // clean restart reports zero truncation
      assert(e2.sql("INSERT INTO rr VALUES (11, 11)").ok)
      val e3 = new Engine(spark, Some(dir))
      val rec3 = e3.storeOf("rr").delta.get.lastRecovery
      assert(rec3.contains(graft.engine.DeltaLog.Recovery(11, 0L)), s"got $rec3")
      // checkpoint = complete copy of the live log (reference
      // wal.hpp:330-397)
      val cp = java.nio.file.Paths.get(dir, "rr.ckpt")
      e3.storeOf("rr").delta.get.checkpoint(cp)
      assert(java.nio.file.Files.size(cp) == java.nio.file.Files.size(log))
      assert(java.nio.file.Files.size(cp) > 0)
    }
  }

  test("EXPLAIN estimates rows across hot and cold layers (footer counts)") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE exl (id BIGINT NOT NULL, v INT)").ok)
      (1 to 6).foreach(i => assert(e.sql(s"INSERT INTO exl VALUES ($i, $i)").ok))
      e.forceFlush("exl")
      (7 to 8).foreach(i => assert(e.sql(s"INSERT INTO exl VALUES ($i, $i)").ok))
      val out = e.sql("EXPLAIN SELECT * FROM exl").rows.flatten.mkString("\n")
      // levels: hot 2, cold 6 → max(maxLevel, total/2) = max(6, 4) = 6
      // (the reference's duplicate-aware estimate,
      // hybrid_query_router.hpp:164-218)
      assert(out.contains("Estimated Rows: 6"), out)
      assert(e.sql("EXPLAIN SELECT * FROM exl WHERE id = 3")
        .rows.flatten.mkString.contains("Estimated Rows: 1"))
    }
  }

  // ---- M1/M4: byte-sized flush trigger -------------------------------------

  test("flush triggers on retained bytes, not only row count") {
    withDir { dir =>
      // 10 KB byte limit, generous row limit: wide rows must still flush
      val e = new Engine(spark, Some(dir), hotLimit = 1000000, hotLimitBytes = 10240)
      assert(e.sql("CREATE TABLE wide (id BIGINT NOT NULL, blob VARCHAR(65535))").ok)
      val kb = "x" * 1024
      (1 to 30).foreach(i => assert(e.sql(s"INSERT INTO wide VALUES ($i, '$kb')").ok))
      val ts = e.stats.tables.find(_.name == "wide").get
      assert(ts.coldTiers >= 1, "byte threshold never flushed")
      assert(ts.hotBytes < 10240 * 2)
      assert(e.sql("SELECT COUNT(*) FROM wide").rows.head.head == "30")
    }
  }

  // ---- M5: stats -----------------------------------------------------------

  test("stats reflect tables, tiers, and op counters") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE st (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("st", (1 to 50).map(i => Array[Any](i.toLong, Int.box(i))))
      e.sql("SELECT COUNT(*) FROM st")
      e.forceFlush("st")
      val s = e.stats
      val ts = s.tables.find(_.name == "st").get
      assert(ts.hotRows == 0 && ts.coldTiers == 1 && ts.coldBytes > 0)
      assert(s.totalWrites == 50 && s.totalRangeQueries >= 1)
      assert(s.currentSeq >= 50)
    }
  }

  // ---- EXPORT / IMPORT dialect verbs ----------------------------------------

  test("EXPORT and IMPORT round-trip a table through parquet") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE ex (id BIGINT NOT NULL, v INT, s VARCHAR(10))").ok)
      e.batchPut("ex", (1 to 100).map(i => Array[Any](i.toLong, Int.box(i), s"s$i")))
      e.forceFlush("ex")
      // hot-over-cold shadow + a tombstone must resolve in the export
      e.batchPut("ex", Seq(Array[Any](7L, Int.box(700), "seven")))
      assert(e.sql("DELETE FROM ex WHERE id = 9").ok)
      val outRoot = java.nio.file.Files.createTempDirectory("graft-exp")
      val out = s"$outRoot/ex"
      try {
        val rs = e.sql(s"EXPORT ex TO '$out'")
        assert(rs.ok, rs.error)
        val back = spark.read.parquet(out)
        assert(back.count() == 99)
        assert(back.filter("id = 7").collect()(0).getInt(1) == 700)
        assert(back.filter("id = 9").isEmpty)
        // error-if-exists: a second export to the same path is loud
        // and must never destroy data it did not write
        val rs2 = e.sql(s"EXPORT ex TO '$out'")
        assert(!rs2.ok && rs2.error.contains("EXPORT failed"), rs2.toString)
        assert(spark.read.parquet(out).count() == 99)

        // IMPORT into a fresh table: full round trip incl. upsert
        // semantics over a pre-existing row
        assert(e.sql("CREATE TABLE im (id BIGINT NOT NULL, v INT, s VARCHAR(10))").ok)
        e.batchPut("im", Seq(Array[Any](7L, Int.box(-1), "old")))
        val ri = e.sql(s"IMPORT im FROM '$out'")
        assert(ri.ok && ri.rowsAffected == 99, ri.toString)
        assert(e.sql("SELECT COUNT(*) FROM im").rows.head.head == "99")
        assert(e.sql("SELECT v FROM im WHERE id = 7").rows.head.head == "700")
        // errors surface as SQL errors, not exceptions
        assert(!e.sql(s"EXPORT nope TO '$out'").ok)
        assert(!e.sql(s"IMPORT im FROM '$outRoot/nonexistent'").ok)
        assert(!e.sql("EXPORT ex TO noquotes").ok)
        assert(e.sql("DROP TABLE im").ok)
      } finally graft.engine.Persist.deleteRecursively(outRoot)
    }
  }

  test("EXPORT is crash-atomic: stale staging is reclaimed, never served or blocking") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE exa (id BIGINT NOT NULL, v INT)").ok)
      e.batchPut("exa", (1 to 50).map(i => Array[Any](i.toLong, Int.box(i))))
      val outRoot = java.nio.file.Files.createTempDirectory("graft-exa")
      val out = s"$outRoot/exa"
      try {
        // simulate a KILLED previous export: its staging dir is left
        // with partial junk, the target never appeared. The retry must
        // reclaim the staging, succeed, and serve only committed data
        // — the pre-staging design left a partial TARGET that blocked
        // every retry ("path already exists") while containing
        // incomplete rows a downstream job could read.
        val staging = java.nio.file.Paths.get(s"$out.__export_staging__")
        java.nio.file.Files.createDirectories(staging)
        java.nio.file.Files.write(staging.resolve("part-junk.parquet"),
          Array[Byte](1, 2, 3))
        assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out)))
        val rs = e.sql(s"EXPORT exa TO '$out'")
        assert(rs.ok, rs.error)
        assert(spark.read.parquet(out).count() == 50)
        assert(!java.nio.file.Files.exists(staging),
          "a committed export must leave no staging residue")
        // never-clobber still holds, and a FAILED export leaves no
        // staging behind to confuse the next attempt
        val rs2 = e.sql(s"EXPORT exa TO '$out'")
        assert(!rs2.ok && rs2.error.contains("EXPORT failed"), rs2.toString)
        assert(!java.nio.file.Files.exists(staging))
        assert(spark.read.parquet(out).count() == 50,
          "a failed export must not disturb the existing target")
      } finally graft.engine.Persist.deleteRecursively(outRoot)
    }
  }

  test("EXPORT under load: ingest and compaction proceed, deferred tiers drain after") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 99)
      assert(e.sql("CREATE TABLE exl (id BIGINT NOT NULL, v INT, s VARCHAR(20))").ok)
      // enough rows that the export write job runs long enough to
      // overlap real churn (the merge-path snapshot: hot + 2 tiers)
      e.batchPut("exl", (1 to 300000).map(i =>
        Array[Any](i.toLong, Int.box(i), s"payload-$i")))
      e.forceFlush("exl")
      e.batchPut("exl", (300001 to 600000).map(i =>
        Array[Any](i.toLong, Int.box(i), s"payload-$i")))
      e.forceFlush("exl")
      val store = e.storeOf("exl")
      val outRoot = java.nio.file.Files.createTempDirectory("graft-exl")
      val out = s"$outRoot/exl"
      try {
        @volatile var exported: graft.engine.ResultSet = null
        val t = new Thread(() => { exported = e.sql(s"EXPORT exl TO '$out'") })
        t.start()
        // concurrent writer + compactor while the export's scan lease
        // is live: every cycle retires a generation the lease pins
        var cycles = 0
        while (t.isAlive && cycles < 12) {
          e.batchPut("exl", Seq(Array[Any]((900000 + cycles).toLong,
            Int.box(cycles), s"during-$cycles")))
          e.forceFlush("exl")
          e.compact("exl")
          cycles += 1
        }
        t.join(120000)
        assert(!t.isAlive, "export did not finish")
        assert(exported.ok, exported.error)
        info(s"churn cycles overlapping the export: $cycles")
        // ingest continued: every concurrent write is queryable
        assert(e.sql("SELECT COUNT(*) FROM exl").rows.head.head
          == (600000 + cycles).toString)
        // the export is a consistent snapshot: no duplicates, no
        // partial rows — between the pre-churn and post-churn counts
        val back = spark.read.parquet(out)
        val n = back.count()
        assert(n >= 600000 && n <= 600000 + cycles, s"exported $n rows")
        assert(back.select("id").distinct().count() == n,
          "exported snapshot must not duplicate rows")
        // the lease released with the export: one more churn cycle
        // must drain the deferred generations it pinned
        e.batchPut("exl", Seq(Array[Any](950000L, Int.box(0), "after")))
        e.forceFlush("exl")
        e.compact("exl")
        assert(store.synchronized(store.retiredGens.size) <= 2, // tierRetainGens
          s"deferred queue did not drain after the export: " +
            s"${store.synchronized(store.retiredGens.size)}")
      } finally graft.engine.Persist.deleteRecursively(outRoot)
    }
  }

  // ---- snapshot-cache reader-safe release ----------------------------------

  test("snapshotCached invalidation under a reader loop never loses a block") {
    val e = new Engine(spark)
    assert(e.sql("CREATE TABLE sc (id BIGINT NOT NULL, v BIGINT)").ok)
    e.batchPut("sc", (1L to 5000L).map(i => Array[Any](i, i)))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val failed = new java.util.concurrent.atomic.AtomicBoolean(false)
    // readers hammer the leased aggregate path (snapshotCached + a
    // collect on the cached plan); the writer bumps the content
    // version between their plan capture and action, so every few
    // reads the cache entry they hold is retired mid-flight — the
    // exact window the old unpersist-on-replace raced
    val readers = (0 until 4).map { _ =>
      new Thread(() => {
        try {
          var i = 0
          while (!failed.get() && i < 100) {
            val r = e.sql("SELECT SUM(v) FROM sc WHERE id <= 5000")
            assert(r.ok && r.rows.head.head == "12502500", r.error)
            i += 1
          }
        } catch { case th: Throwable => errors.add(th); failed.set(true) }
      })
    }
    val writer = new Thread(() => {
      try {
        var i = 0
        while (!failed.get() && i < 400) {
          assert(e.sql(s"INSERT INTO sc VALUES (${10000L + i}, 1)").ok)
          i += 1
        }
      } catch { case th: Throwable => errors.add(th); failed.set(true) }
    })
    (readers :+ writer).foreach(_.start())
    (readers :+ writer).foreach(_.join())
    assert(errors.isEmpty, s"concurrent read/write failed: ${Option(errors.peek()).map(_.toString)}")
    // quiesced: the next leased read's release drains every retired
    // entry — nothing stays persisted once no scan lease is live
    assert(e.sql("SELECT COUNT(*) FROM sc WHERE id >= 1").ok)
    assert(e.storeOf("sc").retiredSnaps.isEmpty,
      "retired snapshot entries must drain once no scan lease is live")
    assert(e.sql("DROP TABLE sc").ok)
  }

  // ---- concurrency: mixed workload (mt_benchmark_htap shape) ---------------

  test("8-thread concurrent mixed workload keeps the store consistent") {
    val e = new Engine(spark)
    assert(e.sql("CREATE TABLE mt (id BIGINT NOT NULL, v BIGINT)").ok)
    e.batchPut("mt", (1L to 200L).map(i => Array[Any](i, i)))
    val threads = 8
    val opsPerThread = 200
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = (0 until threads).map { t =>
      new Thread(() => {
        try {
          val rng = new scala.util.Random(t)
          (0 until opsPerThread).foreach { i =>
            rng.nextInt(4) match {
              case 0 => // writer: upsert into own key range (no cross-thread races on a key)
                val id = 1000L + t * 1000 + rng.nextInt(200)
                assert(e.sql(s"INSERT INTO mt VALUES ($id, ${i.toLong})").ok)
              case 1 => // point read
                val r = e.sql(s"SELECT v FROM mt WHERE id = ${1 + rng.nextInt(200)}")
                assert(r.ok)
              case 2 => // aggregate over the stable seed range
                val r = e.sql("SELECT COUNT(*) FROM mt WHERE id <= 200")
                assert(r.ok && r.rows.head.head == "200")
              case 3 => // update own range
                val id = 1000L + t * 1000 + rng.nextInt(200)
                assert(e.sql(s"UPDATE mt SET v = 0 WHERE id = $id").ok)
            }
          }
        } catch { case th: Throwable => errors.add(th) }
      })
    }
    pool.foreach(_.start()); pool.foreach(_.join())
    assert(errors.isEmpty, s"concurrent ops failed: ${Option(errors.peek()).map(_.getMessage)}")
    // seed range untouched by writers
    assert(e.sql("SELECT COUNT(*) FROM mt WHERE id <= 200").rows.head.head == "200")
    assert(e.sql("SELECT SUM(v) FROM mt WHERE id <= 200").rows.head.head == "20100")
  }

  // ---- SEARCH: similarity search on the engine surface (r19) --------------

  /** A double as a dialect-lexable numeric literal (the SEARCH vector
    * syntax has no E-notation; BigDecimal's plain string is the exact
    * decimal expansion, so CAST back recovers the identical double).
    */
  private def plain(x: Double): String =
    new java.math.BigDecimal(x).toPlainString

  test("SEARCH verb: every route matches the declared ANN paths on the planted fixture") {
    val sfDir = "/root/testdata/sf0.01"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import org.apache.spark.sql.functions._
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE vecs (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR)").ok)
      // the SAME clone-augmented corpus the oracled q_ann_* paths
      // search, loaded through the engine's own bulk path with
      // vectors as the dialect's VARCHAR encoding
      val planted = graft.queries.AnnIndex.plantedKnnDir(spark, sfDir)
      val src = spark.read.parquet(s"$planted/embeddings.parquet")
        .select(col("vec_id").as("id"),
          concat_ws(",", expr(
            "transform(embedding, x -> CAST(CAST(x AS DOUBLE) AS STRING))")).as("v"))
      BulkLoader.loadFrom(e, "vecs", src)
      // comparator: the declared planted-fixture path (q_ann_lsh —
      // provably exact-equal to brute force on this corpus, shared
      // plantedKnnOracle), rank-ordered per query
      val declared = SparkEntry.queries("q_ann_lsh")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      val qVecs = spark.read.parquet(s"$planted/embeddings.parquet")
        .filter(col("vec_id") < 10)
        .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
        .collect().map(r => (r.getLong(0),
          r.getSeq[Double](1).toArray)).toMap
      def searchIds(q: Array[Double], method: String): Seq[Long] = {
        val lit = q.map(plain).mkString(", ")
        val rs = e.sql(s"SEARCH vecs NEAREST ($lit) TOP 6 USING $method")
        assert(rs.ok, rs.error)
        assert(rs.headers == Vector("id", "cosine"), rs.headers.toString)
        rs.rows.map(_.head.toLong)
      }
      // the query vector IS corpus row q (cosine 1, lowest id among
      // the score-1 clone ties) — TOP 6 = self + the declared path's
      // 5 planted-clone neighbors, in rank order. ivfpq included
      // (r20): clones carry the query's exact PQ code, so the ADC
      // shortlist holds them and the exact re-rank restores rank order
      for (qid <- Seq(0L, 3L, 7L); method <- Seq("exact", "lsh", "ivf", "ivfpq")) {
        val got = searchIds(qVecs(qid), method)
        assert(got == qid +: declared(qid),
          s"$method for q=$qid: got $got, declared ${declared(qid)}")
      }
    }
  }

  test("SEARCH verb: post-build writes are searchable, deletes never return, growth rebuilds") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE sv (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR)").ok)
      val rng = new scala.util.Random(11L)
      def randVec(): Array[Double] = Array.fill(64)(rng.nextGaussian())
      def vstr(v: Array[Double]): String = v.map(plain).mkString(",")
      e.batchPut("sv", (0L until 100L).map(i => Array[Any](i, vstr(randVec()))))
      val target = randVec()
      val lit = target.map(plain).mkString(", ")
      // first search builds the artifact (n < ExactMax, but USING
      // forces the index route — the auto route would go exact here)
      assert(e.sql(s"SEARCH sv NEAREST ($lit) TOP 3 USING lsh").ok)
      val metaFile = java.nio.file.Paths.get(dir, "annidx", "sv", "v_lsh", "_META")
      assert(java.nio.file.Files.isRegularFile(metaFile), "artifact meta must exist")
      val meta0 = new String(java.nio.file.Files.readAllBytes(metaFile))
      // INSERT after the build: the delta fold must surface it with
      // NO rebuild (an exact clone of the query hits its buckets with
      // probability 1 — the planted-clone argument)
      assert(e.sql(s"INSERT INTO sv VALUES (500, '${vstr(target)}')").ok)
      val r1 = e.sql(s"SEARCH sv NEAREST ($lit) TOP 3 USING lsh")
      assert(r1.ok && r1.rows.head.head == "500",
        s"inserted clone must be the nearest: ${r1.rows}")
      assert(new String(java.nio.file.Files.readAllBytes(metaFile)) == meta0,
        "a within-bound insert must not rebuild the artifact")
      // UPDATE re-vectors a row: new __seq puts it in the delta, so
      // it is findable at its NEW position immediately
      assert(e.sql(s"UPDATE sv SET v = '${vstr(target)}' WHERE id = 7").ok)
      val r2 = e.sql(s"SEARCH sv NEAREST ($lit) TOP 3 USING lsh")
      assert(r2.ok && r2.rows.map(_.head).take(2) == Vector("7", "500"),
        s"updated row must surface at its new position: ${r2.rows}")
      // DELETE: stale index entries die in the live-corpus re-rank
      assert(e.sql("DELETE FROM sv WHERE id = 500").ok)
      val r3 = e.sql(s"SEARCH sv NEAREST ($lit) TOP 3 USING lsh")
      assert(r3.ok && !r3.rows.exists(_.head == "500"),
        s"a deleted row must never be returned: ${r3.rows}")
      // growth past the re-train bound (50 new rows > 20% of 101)
      // rebuilds into a fresh generation
      e.batchPut("sv", (600L until 650L).map(i => Array[Any](i, vstr(randVec()))))
      val r4 = e.sql(s"SEARCH sv NEAREST ($lit) TOP 3 USING lsh")
      assert(r4.ok && r4.rows.head.head == "7", r4.rows.toString)
      assert(new String(java.nio.file.Files.readAllBytes(metaFile)) != meta0,
        "growth past the re-train bound must rebuild the artifact")
      // ivfpq (r20): same freshness contract — the grown corpus's
      // nearest (the id-7 clone) tops the PQ route too, and the
      // deleted row stays dead through the ADC shortlist
      val r5 = e.sql(s"SEARCH sv NEAREST ($lit) TOP 3 USING ivfpq")
      assert(r5.ok && r5.rows.head.head == "7", r5.rows.toString)
      assert(!r5.rows.exists(_.head == "500"), r5.rows.toString)
      // a query dimension matching NO live row searches an empty
      // corpus exactly (r20 — index routes are no longer 64-dim-only,
      // so a dim mismatch is an empty result, not an error)
      val r6 = e.sql("SEARCH sv NEAREST (1.0, 2.0) TOP 3 USING lsh")
      assert(r6.ok && r6.rows.isEmpty, r6.rows.toString)
      // loud errors, never exceptions, through the SQL surface
      assert(!e.sql("SEARCH nope NEAREST (1.0) TOP 1").ok)
      assert(!e.sql(s"SEARCH sv NEAREST ($lit) TOP 3 VECTOR missing").ok)
    }
  }

  test("SEARCH verb: index routes at a non-64 dimension (r20)") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql("CREATE TABLE sw (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR)").ok)
      val rng = new scala.util.Random(23L)
      val dim = 32
      def randVec(): Array[Double] = Array.fill(dim)(rng.nextGaussian())
      def vstr(v: Array[Double]): String = v.map(plain).mkString(",")
      val rows = (0L until 200L).map(i => (i, randVec()))
      e.batchPut("sw", rows.map { case (i, v) => Array[Any](i, vstr(v)) })
      // plant 3 exact clones of row 5 — identical sign bits, identical
      // cluster, identical PQ code: every index route must find them
      val target = rows(5)._2
      e.batchPut("sw", Seq(900L, 901L, 902L).map(i =>
        Array[Any](i, vstr(target))))
      val lit = target.map(plain).mkString(", ")
      val exact = e.sql(s"SEARCH sw NEAREST ($lit) TOP 4 USING exact")
      assert(exact.ok, exact.error)
      assert(exact.rows.map(_.head).toSet == Set("5", "900", "901", "902"),
        exact.rows.toString)
      for (method <- Seq("lsh", "ivf", "ivfpq")) {
        val rs = e.sql(s"SEARCH sw NEAREST ($lit) TOP 4 USING $method")
        assert(rs.ok, s"$method: ${rs.error}")
        assert(rs.rows == exact.rows,
          s"$method at dim $dim diverged from exact: ${rs.rows} vs ${exact.rows}")
      }
      // ivfpq's one dimensional constraint: dim must divide into the
      // PQ subspaces — a 6-dim table errors loudly on that route only
      assert(e.sql("CREATE TABLE s6 (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR)").ok)
      e.batchPut("s6", (0L until 50L).map(i =>
        Array[Any](i, (0 until 6).map(_ => plain(rng.nextGaussian())).mkString(","))))
      val q6 = (0 until 6).map(_ => plain(rng.nextGaussian())).mkString(", ")
      assert(!e.sql(s"SEARCH s6 NEAREST ($q6) TOP 3 USING ivfpq").ok)
      val l6 = e.sql(s"SEARCH s6 NEAREST ($q6) TOP 3 USING lsh")
      assert(l6.ok && l6.rows.size == 3, l6.error)
    }
  }
}
