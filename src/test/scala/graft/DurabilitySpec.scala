package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{ColType, ColumnDef, DeltaLog, Engine, RowVersion, TableMeta}

/** Gates on the r20 durability machinery: the cross-thread group
  * commit (DeltaLog.stage/syncTo), the suffix-keeping WAL rewrite
  * (truncateThrough — the reference WAL's truncate(seq),
  * wal.hpp:330-397), and the freeze-and-swap flush's observable
  * contract (writes landing DURING a flush survive it, in memory and
  * across a restart).
  */
class DurabilitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def withDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-durability").toString
    try f(dir)
    finally graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  private val meta = TableMeta("t",
    Vector(ColumnDef("id", ColType.I64, notNull = true),
      ColumnDef("v", ColType.Str, notNull = false)), "id")

  test("truncateThrough keeps the in-flight suffix, byte-exact") {
    withDir { dir =>
      val path = java.nio.file.Paths.get(dir, "t.log")
      val dl = new DeltaLog(path, meta)
      dl.appendBatch((1L to 10L).map(i =>
        RowVersion(i, tombstone = false, Array[Any](i, s"r$i"))))
      dl.truncateThrough(5L)
      // records above the cutoff survive the rewrite and later appends
      // land behind them
      dl.appendBatch(Seq(RowVersion(11L, tombstone = false, Array[Any](11L, "r11"))))
      dl.close()
      val back = new DeltaLog(path, meta).replay()
      assert(back.map(_.seq) == Vector(6L, 7L, 8L, 9L, 10L, 11L),
        back.map(_.seq).toString)
      assert(back.forall(rv => rv.values(1) == s"r${rv.seq}"))
      // a full truncate-through leaves an empty (but appendable) log
      val dl2 = new DeltaLog(path, meta)
      dl2.truncateThrough(Long.MaxValue)
      dl2.close()
      assert(new DeltaLog(path, meta).replay().isEmpty)
    }
  }

  test("truncateThrough drops a torn tail exactly as replay would") {
    withDir { dir =>
      val path = java.nio.file.Paths.get(dir, "torn.log")
      val dl = new DeltaLog(path, meta)
      dl.appendBatch((1L to 6L).map(i =>
        RowVersion(i, tombstone = false, Array[Any](i, s"r$i"))))
      dl.close()
      // simulate a torn write: append garbage bytes to the log
      java.nio.file.Files.write(path, Array[Byte](9, 9, 9, 9, 9),
        java.nio.file.StandardOpenOption.APPEND)
      val dl2 = new DeltaLog(path, meta)
      dl2.truncateThrough(3L)
      dl2.appendBatch(Seq(RowVersion(7L, tombstone = false, Array[Any](7L, "r7"))))
      dl2.close()
      // intact records above the cutoff survive; the garbage is gone
      // (not re-parsed as a frame), and post-truncate appends land clean
      val back = new DeltaLog(path, meta).replay()
      assert(back.map(_.seq) == Vector(4L, 5L, 6L, 7L), back.map(_.seq).toString)
    }
  }

  test("truncateThrough rejects a CRC-corrupted mid-log frame exactly as replay would") {
    withDir { dir =>
      val path = java.nio.file.Paths.get(dir, "crc.log")
      val dl = new DeltaLog(path, meta)
      dl.appendBatch((1L to 6L).map(i =>
        RowVersion(i, tombstone = false, Array[Any](i, s"r$i"))))
      dl.close()
      // flip one PAYLOAD byte of record 5: its frame length stays
      // intact, so a length-only walk would keep it — only the CRC
      // check can reject it (the r20 ADVICE gap)
      val all = java.nio.file.Files.readAllBytes(path)
      var off = 0
      def i32(at: Int) = ((all(at) & 0xff) << 24) | ((all(at + 1) & 0xff) << 16) |
        ((all(at + 2) & 0xff) << 8) | (all(at + 3) & 0xff)
      (1 to 4).foreach(_ => off += 4 + i32(off) + 8) // skip records 1-4
      all(off + 4 + 10) = (all(off + 4 + 10) ^ 0x55).toByte // payload byte of rec 5
      java.nio.file.Files.write(path, all)
      val dl2 = new DeltaLog(path, meta)
      dl2.truncateThrough(2L)
      dl2.appendBatch(Seq(RowVersion(7L, tombstone = false, Array[Any](7L, "r7"))))
      dl2.close()
      // replay must agree with the rewrite: 3,4 survive the cutoff,
      // corrupt 5 AND intact-but-after-corruption 6 are gone, 7 lands
      // clean; the dropped bytes are preserved for offline repair
      val back = new DeltaLog(path, meta).replay()
      assert(back.map(_.seq) == Vector(3L, 4L, 7L), back.map(_.seq).toString)
      assert(java.nio.file.Files.exists(
        path.resolveSibling("crc.log.corrupt")))
    }
  }

  test("flush truncates the WAL: log size stays memtable-bounded, not table-bounded") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), hotLimit = Int.MaxValue,
        hotLimitBytes = Long.MaxValue)
      assert(e.sql("CREATE TABLE wb (id BIGINT NOT NULL, v VARCHAR)").ok)
      val logPath = java.nio.file.Paths.get(dir, "delta", "wb.log")
      def put(base: Long): Unit = e.batchPut("wb",
        (0 until 1000).map(j => Array[Any](base + j, s"v${base + j}")))
      put(0L)
      val oneBatch = java.nio.file.Files.size(logPath)
      // grow the table 5x, flushing between batches — the DeltaLog
      // scaladoc's size bound: each flush truncateThrough-s the
      // flushed prefix, so the live log tracks the UNFLUSHED window
      // (≈ one batch here), never the table's cumulative size
      (1 to 5).foreach { k => e.forceFlush("wb"); put(k * 1000L) }
      val afterFlushes = java.nio.file.Files.size(logPath)
      assert(afterFlushes <= 2 * oneBatch,
        s"log grew table-proportional: $afterFlushes vs one-batch $oneBatch")
    }
  }

  test("concurrent group-committed batches all survive a replay") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), hotLimit = Int.MaxValue,
        hotLimitBytes = Long.MaxValue)
      assert(e.sql("CREATE TABLE gc (id BIGINT NOT NULL, v VARCHAR)").ok)
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          (0 until 40).foreach { k =>
            val base = (t * 40 + k) * 25L
            e.batchPut("gc", (0 until 25).map(j =>
              Array[Any](base + j, s"w$t")))
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      // every acked write is durable: a fresh engine on the same dir
      // replays the WAL (nothing was flushed) and sees all 8000 rows
      val e2 = new Engine(spark, Some(dir))
      val r = e2.sql("SELECT COUNT(*) FROM gc")
      assert(r.ok && r.rows.head.head == "8000", r.rows.toString)
    }
  }

  test("writes landing during a freeze-and-swap flush survive it and a restart") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), hotLimit = Int.MaxValue,
        hotLimitBytes = Long.MaxValue)
      assert(e.sql("CREATE TABLE fz (id BIGINT NOT NULL, v VARCHAR)").ok)
      e.batchPut("fz", (0L until 20000L).map(i => Array[Any](i, "seed")))
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val written = new java.util.concurrent.atomic.AtomicLong(0L)
      val writer = new Thread(() => {
        var next = 1000000L
        while (!stop.get()) {
          e.batchPut("fz", (0 until 50).map(j => Array[Any](next + j, "during")))
          written.addAndGet(50L)
          next += 50L
        }
      })
      writer.start()
      // several flushes while the writer runs: each freeze snapshots,
      // writes its tier lock-free, and must retain (not drop) the
      // rows the writer landed during the tier write
      (1 to 3).foreach { _ => e.forceFlush("fz"); Thread.sleep(50) }
      stop.set(true); writer.join()
      e.forceFlush("fz")
      val expect = (20000L + written.get()).toString
      val r1 = e.sql("SELECT COUNT(*) FROM fz")
      assert(r1.ok && r1.rows.head.head == expect, s"${r1.rows} vs $expect")
      // restart: manifest + truncated-through WAL reconstruct the same
      // state — no lost in-flight rows, no hot duplicates of flushed
      // rows (recover skips records at or below the flushed max)
      val e2 = new Engine(spark, Some(dir))
      val r2 = e2.sql("SELECT COUNT(*) FROM fz")
      assert(r2.ok && r2.rows.head.head == expect, s"${r2.rows} vs $expect")
      // and an UPDATE written mid-flush-era resolves LWW correctly
      assert(e2.sql("UPDATE fz SET v = 'after' WHERE id = 5").ok)
      val r3 = e2.sql("SELECT v FROM fz WHERE id = 5")
      assert(r3.ok && r3.rows.head.head == "after", r3.rows.toString)
    }
  }
}
