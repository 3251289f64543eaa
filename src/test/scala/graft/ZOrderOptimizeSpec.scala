package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine

/** The OPTIMIZE ZORDER gate (VERDICT r14 directive 1): rewriting a
  * table's cold tiers Morton-clustered must (a) leave the merged
  * snapshot CONTENT-IDENTICAL, (b) make a two-dimensional predicate
  * box read a FRACTION of the row groups it read before (measured
  * from parquet footers via Engine.coldRowGroupStats — the same
  * min/max pruning the scan uses), (c) keep cold point lookups
  * working (pk blooms survive the layout), and (d) survive restart
  * AND subsequent ingest + major compaction (layout persisted in the
  * manifest, honored by every bottom rewrite).
  */
class ZOrderOptimizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def withDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-zopt").toString
    try f(dir)
    finally graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  // x and y decorrelated from the pk and from each other (distinct
  // odd multipliers mod 4096) — so in pk-sorted files EVERY file
  // spans essentially the full (x, y) range and nothing prunes
  private def row(id: Long): Array[Any] =
    Array[Any](id, (id * 2654435761L) % 4096L, (id * 40503L) % 4096L, "p" * 48)

  private val ddl =
    "CREATE TABLE zt (id BIGINT NOT NULL, x BIGINT, y BIGINT, pad VARCHAR(64))"

  // a 1/8 x 1/8 box in both layout dimensions
  private val box = Map("x" -> (0.0, 511.0), "y" -> (0.0, 511.0))

  test("optimize rewrites z-ordered: identical snapshot, pruned row groups, live blooms, durable layout") {
    withDir { dir =>
      // high compactTrigger keeps the four flushed L0 tiers distinct,
      // so the BEFORE measurement covers a multi-tier pk-sorted set
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      assert(e.sql(ddl).ok)
      for (chunk <- 0 until 4) {
        e.batchPut("zt", (1 to 6000).map(j => row((chunk * 6000 + j).toLong)))
        e.forceFlush("zt")
      }
      val before = e.snapshot("zt").orderBy("id").collect().toSeq
      assert(before.size == 24000)

      val (ovB, totB) = e.coldRowGroupStats("zt", box)
      assert(totB >= 4, s"expected >=4 row groups before, got $totB")
      assert(ovB.toDouble / totB >= 0.9,
        s"pk-sorted tiers should NOT prune the 2-D box: $ovB/$totB")

      // small target part size so the sub-MB test corpus (NDV-sized
      // blooms keep tiers lean) still yields a multi-file layout (a
      // real deployment keeps the 64 MB default)
      val outcome = e.optimizeZorder("zt", Seq("x", "y"), targetPartBytes = 16L << 10)
      assert(outcome == "rewritten")

      // (a) snapshot content-identical
      val after = e.snapshot("zt").orderBy("id").collect().toSeq
      assert(after == before, "OPTIMIZE must not change the merged snapshot")

      // (b) the same box now reads a fraction of the row groups
      val (ovA, totA) = e.coldRowGroupStats("zt", box)
      assert(totA >= 16, s"expected a multi-file z layout, got $totA row groups")
      val frac = ovA.toDouble / totA
      info(f"row-group pruning for the 1/8 x 1/8 box: before $ovB/$totB, after $ovA/$totA (${frac * 100}%.1f%%)")
      assert(frac <= 0.3,
        s"z-ordered tier must prune the 2-D box to <=30% of row groups, got $ovA/$totA")

      // (c) cold point lookups still served (bloom path — pk footer
      // ranges overlap after the layout, the bloom prunes instead)
      val got = e.batchGet("zt", Seq(5L, 12345L, 23999L, 999999L))
      assert(got.size == 3 && got(12345L)(0) == 12345L)

      // the bottom tier advertises its layout in the name encoding
      assert(e.storeOf("zt").coldDirs.forall(t =>
        java.nio.file.Paths.get(t).getFileName.toString.startsWith("tier-z")))
      assert(e.explainSpark("SELECT count(*) FROM zt").contains("zorder(x,y)"))

      // (d) restart: layout + pruning survive the manifest round-trip
      val e2 = new Engine(spark, Some(dir))
      assert(e2.snapshot("zt").orderBy("id").collect().toSeq == before)
      assert(e2.coldRowGroupStats("zt", box) == ((ovA, totA)))

      // ingest more, flush, admin major compaction: the rewrite must
      // come out z-ordered again (tier-z), not regress to pk-sorted
      e2.batchPut("zt", (24001 to 30000).map(i => row(i.toLong)))
      e2.forceFlush("zt")
      e2.compact("zt")
      val tiers = e2.storeOf("zt").coldDirs
      assert(tiers.size == 1 &&
        java.nio.file.Paths.get(tiers.head).getFileName.toString.startsWith("tier-z"),
        s"major compaction under a declared layout must write tier-z, got $tiers")
      assert(e2.sql("SELECT COUNT(*) FROM zt").rows.head.head == "30000")
    }
  }

  test("OPTIMIZE ... ZORDER BY reaches the rewrite through the SQL front") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      assert(e.sql(ddl).ok)
      e.batchPut("zt", (1 to 1000).map(i => row(i.toLong)))
      e.forceFlush("zt")
      val rs = e.sql("OPTIMIZE zt ZORDER BY (x, y)")
      assert(rs.ok && rs.rows.head.head.contains("rewritten"), rs.toString)
      assert(e.storeOf("zt").layout == Vector("x", "y"))
      assert(e.storeOf("zt").coldDirs.forall(t =>
        java.nio.file.Paths.get(t).getFileName.toString.startsWith("tier-z")))
      // PARTSIZE reaches the engine: same columns at a new
      // granularity rewrites, exact repeat no-ops, and bad sizes
      // surface as SQL errors
      val rs2 = e.sql("OPTIMIZE zt ZORDER BY (x, y) PARTSIZE 32768")
      assert(rs2.ok && rs2.rows.head.head.contains("rewritten"), rs2.toString)
      val rs3 = e.sql("OPTIMIZE zt ZORDER BY (x, y) PARTSIZE 32768")
      assert(rs3.ok && rs3.rows.head.head.contains("noop"), rs3.toString)
      val badSize = e.sql("OPTIMIZE zt ZORDER BY (x, y) PARTSIZE 0")
      assert(!badSize.ok && badSize.error.contains("positive"), badSize.toString)
      val badTok = e.sql("OPTIMIZE zt ZORDER BY (x, y) PARTSIZE lots")
      assert(!badTok.ok, badTok.toString)
      // keyword is case-insensitive like the rest of the dialect, and
      // trailing tokens after the clause stay loud parse errors
      val lower = e.sql("optimize zt zorder by (x, y) partsize 32768")
      assert(lower.ok && lower.rows.head.head.contains("noop"), lower.toString)
      val trail = e.sql("OPTIMIZE zt ZORDER BY (x, y) PARTSIZE 32768 extra")
      assert(!trail.ok && trail.error.contains("trailing"), trail.toString)
      // validation errors surface as SQL errors, not exceptions
      val bad = e.sql("OPTIMIZE zt ZORDER BY (x)")
      assert(!bad.ok && bad.error.contains("2 to 4"), bad.toString)
      val parseErr = e.sql("OPTIMIZE zt CLUSTER BY (x, y)")
      assert(!parseErr.ok, parseErr.toString)
    }
  }

  test("z-codes stay defined under NaN/Infinity/null layout values (ANSI-safe cast)") {
    import org.apache.spark.sql.functions.col
    import graft.operators.ZOrder
    import spark.implicits._
    val df = Seq(
      (1L, Some(1.0), Some(10.0)),
      (2L, Some(Double.NaN), Some(20.0)),
      (3L, Some(Double.PositiveInfinity), Some(30.0)),
      (4L, Some(Double.NegativeInfinity), Some(40.0)),
      (5L, None: Option[Double], Some(25.0)),
      (6L, Some(100.0), Some(40.0)),
      (7L, Some(1.0), Some(20.0)),   // finite twin of row 2 (NaN -> lo cell)
      (8L, Some(100.0), Some(30.0))  // finite twin of row 3 (+inf -> hi cell)
    ).toDF("id", "a", "b")
    // bounds are taken over FINITE values only — one NaN/Inf row must
    // not poison the scale for the whole tier
    val bs = ZOrder.bounds(df, Seq("a", "b"))
    assert(bs("a") == ((1.0, 100.0)) && bs("b") == ((10.0, 40.0)), bs.toString)
    // the code projection must not throw under Spark's default ANSI
    // mode (CAST(NaN AS LONG) would), and every code stays in range
    val codes = df.select(col("id"), ZOrder.zcodeColumn(Seq("a", "b"), bs).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes.values.forall(z => z >= 0L && z < (1L << 32)), codes.toString)
    // NaN and null land in cell 0 of their dimension; infinities clamp
    // to the edge cells — each equals its finite twin's code
    assert(codes(2L) == codes(7L), s"NaN must code like lo: $codes")
    assert(codes(3L) == codes(8L), s"+Inf must clamp to the hi cell: $codes")
    assert(codes(4L) != codes(3L), "-Inf and +Inf must land on opposite edges")
  }

  test("optimize survives NaN/Infinity rows in a DOUBLE layout column end-to-end") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      assert(e.sql(
        "CREATE TABLE nt (id BIGINT NOT NULL, x BIGINT, v DOUBLE)").ok)
      val rows: Seq[Array[Any]] = (1 to 2000).map { i =>
        val v: Any =
          if (i % 501 == 0) Double.NaN
          else if (i % 502 == 0) Double.PositiveInfinity
          else if (i % 503 == 0) Double.NegativeInfinity
          else (i * 40503 % 4096).toDouble
        Array[Any](i.toLong, (i * 2654435761L) % 4096L, v)
      }
      e.batchPut("nt", rows)
      e.forceFlush("nt")
      val before = e.snapshot("nt").orderBy("id").collect().toSeq
      // under ANSI, an unguarded CAST(NaN AS LONG) would abort this
      // whole rewrite — the guard must land every row in a valid cell
      assert(e.optimizeZorder("nt", Seq("x", "v")) == "rewritten")
      assert(e.snapshot("nt").orderBy("id").collect().toSeq == before,
        "OPTIMIZE over dirty numerics must not change the snapshot")
      assert(e.optimizeZorder("nt", Seq("x", "v")) == "noop")
    }
  }

  test("optimize validates its layout columns loudly") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir))
      assert(e.sql(ddl).ok)
      e.batchPut("zt", (1 to 100).map(i => row(i.toLong)))
      e.forceFlush("zt")
      def err(f: => Any): String =
        intercept[graft.engine.EngineException](f).getMessage
      assert(err(e.optimizeZorder("nope", Seq("x", "y"))).contains("does not exist"))
      assert(err(e.optimizeZorder("zt", Seq("x", "zzz"))).contains("does not exist"))
      assert(err(e.optimizeZorder("zt", Seq("x"))).contains("2 to 4"))
      assert(err(e.optimizeZorder("zt", Seq("x", "y", "x", "y", "id"))).contains("2 to 4"))
      assert(err(e.optimizeZorder("zt", Seq("x", "pad"))).contains("numeric or TIMESTAMP"))
      assert(err(e.optimizeZorder("zt", Seq("x", "X"))).contains("distinct"))
      // nothing above may have recorded a layout
      assert(e.storeOf("zt").layout.isEmpty)
    }
  }

  test("re-OPTIMIZE with different columns rewrites; with the same columns it stays free") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      assert(e.sql(ddl).ok)
      e.batchPut("zt", (1 to 3000).map(i => row(i.toLong)))
      e.forceFlush("zt")
      assert(e.optimizeZorder("zt", Seq("x", "y")) == "rewritten")
      val t1 = e.storeOf("zt").coldDirs
      // same columns over the already-laid-out single tier: free
      assert(e.optimizeZorder("zt", Seq("x", "y")) == "noop")
      assert(e.storeOf("zt").coldDirs == t1)
      // DIFFERENT columns must rewrite — the tier name carries the
      // layout hash it was written under, so the guard can tell a
      // stale z layout from the current one without opening files
      assert(e.optimizeZorder("zt", Seq("id", "x")) == "rewritten")
      val t2 = e.storeOf("zt").coldDirs
      assert(t2 != t1, "new layout columns must produce a new bottom tier")
      assert(e.storeOf("zt").layout == Vector("id", "x"))
      // and the new layout is itself stable under a repeat
      assert(e.optimizeZorder("zt", Seq("id", "x")) == "noop")
      // SAME columns at a DIFFERENT part size must also rewrite —
      // the tier token carries the granularity, not just the columns
      assert(e.optimizeZorder("zt", Seq("id", "x"), targetPartBytes = 32L << 10)
        == "rewritten")
      assert(e.optimizeZorder("zt", Seq("id", "x"), targetPartBytes = 32L << 10)
        == "noop")
      assert(e.snapshot("zt").count() == 3000)
    }
  }

  test("incremental OPTIMIZE folds only new tiers: rewrite cost ∝ ingest, snapshot and pruning intact, fanout binpacks") {
    withDir { dir =>
      def treeBytes(path: String): Long =
        java.nio.file.Files.walk(java.nio.file.Paths.get(path)).toArray
          .map(_.asInstanceOf[java.nio.file.Path])
          .filter(p => java.nio.file.Files.isRegularFile(p))
          .map(p => java.nio.file.Files.size(p)).sum
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      assert(e.sql(ddl).ok)
      for (chunk <- 0 until 4) {
        e.batchPut("zt", (1 to 6000).map(j => row((chunk * 6000 + j).toLong)))
        e.forceFlush("zt")
      }
      assert(e.optimizeZorder("zt", Seq("x", "y"), targetPartBytes = 32L << 10) == "rewritten")
      val bigTier = e.storeOf("zt").coldDirs.head
      assert(e.storeOf("zt").coldDirs == Vector(bigTier))
      def unlaid(): Long = e.stats.tables.find(_.name == "zt").get.unlaidBytes
      assert(unlaid() == 0L, "a fully laid-out table reports zero drift")

      // ingest 1/12th more (with one DELETE shadowing a big-tier row:
      // the incremental fold must carry its tombstone forward, since
      // the kept z tier still holds the shadowed version)
      e.batchPut("zt", (24001 to 26000).map(i => row(i.toLong)))
      assert(e.sql("DELETE FROM zt WHERE id = 5").ok)
      e.forceFlush("zt")
      val snapBefore = e.snapshot("zt").orderBy("id").collect().toSeq
      assert(snapBefore.size == 25999)
      // the flushed dirty tier is the observable z-layout drift bound
      // (stats.unlaidBytes, also on /api/status) — and the incremental
      // rewrite's exact cost
      assert(unlaid() > 0L, "ingest above the z chain must surface as drift")

      assert(e.optimizeZorder("zt", Seq("x", "y"), targetPartBytes = 32L << 10) == "rewritten")
      assert(unlaid() == 0L, "incremental OPTIMIZE must clear the drift")
      val after = e.storeOf("zt").coldDirs
      // the existing z tier was NOT rewritten — incremental cost is
      // the dirty tier only, an order of magnitude below the table
      assert(after.contains(bigTier),
        "incremental OPTIMIZE must keep the already-laid-out z tier in place")
      assert(after.size == 2, s"expected [kept z, new z], got $after")
      val newTier = after.filterNot(_ == bigTier).head
      // the fold read and wrote ONLY the dirty rows (2000 inserts +
      // the carried tombstone), at a byte cost ∝ ingest
      assert(spark.read.parquet(newTier).count() == 2001,
        "incremental fold must contain exactly the ingested rows + tombstone")
      assert(treeBytes(newTier) < treeBytes(bigTier) / 4,
        s"folded tier ${treeBytes(newTier)}B should be a fraction of the kept ${treeBytes(bigTier)}B")
      // age order: kept z tier first (older), minted tier after it
      assert(after.head == bigTier, "kept z tier must keep its age position")

      // snapshot identity across the incremental fold (incl. the
      // tombstone carried forward over the kept tier's row)
      assert(e.snapshot("zt").orderBy("id").collect().toSeq == snapBefore)
      assert(e.sql("SELECT COUNT(*) FROM zt WHERE id = 5").rows.head.head == "0")
      // pruning intact: the box still reads a small fraction
      val (ov, tot) = e.coldRowGroupStats("zt", box)
      assert(ov.toDouble / tot <= 0.3,
        s"box should prune after incremental OPTIMIZE: $ov/$tot row groups")
      // cold point lookup across the two-tier z chain
      assert(e.sql("SELECT id FROM zt WHERE id = 24500").rows.size == 1)
      // nothing new: free
      assert(e.optimizeZorder("zt", Seq("x", "y"), targetPartBytes = 32L << 10) == "noop")

      // fanout bound: the chain grows 2 → 3 → 4, then the next
      // OPTIMIZE binpacks everything (tombstones drop in a full fold)
      var next = 26001
      for (expected <- Seq(3, 4)) {
        e.batchPut("zt", (next to next + 199).map(i => row(i.toLong)))
        e.forceFlush("zt")
        next += 200
        assert(e.optimizeZorder("zt", Seq("x", "y"), targetPartBytes = 32L << 10) == "rewritten")
        assert(e.storeOf("zt").coldDirs.size == expected,
          s"chain should grow to $expected, got ${e.storeOf("zt").coldDirs}")
      }
      e.batchPut("zt", (next to next + 199).map(i => row(i.toLong)))
      e.forceFlush("zt")
      next += 200
      assert(e.optimizeZorder("zt", Seq("x", "y"), targetPartBytes = 32L << 10) == "rewritten")
      assert(e.storeOf("zt").coldDirs.size == 1,
        s"at the fanout the chain must binpack to one tier, got ${e.storeOf("zt").coldDirs}")
      assert(e.sql("SELECT COUNT(*) FROM zt").rows.head.head == (next - 1 - 1).toString)
    }
  }

  test("the OPTIMIZE part size is persisted and honored by later major rewrites") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      assert(e.sql(ddl).ok)
      e.batchPut("zt", (1 to 24000).map(i => row(i.toLong)))
      e.forceFlush("zt")
      assert(e.optimizeZorder("zt", Seq("x", "y"), targetPartBytes = 32L << 10)
        == "rewritten")
      def partFiles(t: String): Int =
        java.nio.file.Files.list(java.nio.file.Paths.get(t)).toArray
          .map(_.toString).count(f => f.contains("part-") && f.endsWith(".parquet"))
      val n1 = partFiles(e.storeOf("zt").coldDirs.head)
      assert(n1 >= 8, s"32 KiB parts over the test corpus must yield a multi-file tier, got $n1")
      // restart, ingest, admin major: the rewrite must come out at the
      // REQUESTED granularity (LAYOUTBYTES round-trips the manifest),
      // not collapse to one default-size file
      val e2 = new Engine(spark, Some(dir))
      e2.batchPut("zt", (24001 to 26000).map(i => row(i.toLong)))
      e2.forceFlush("zt")
      e2.compact("zt")
      val tiers = e2.storeOf("zt").coldDirs
      assert(tiers.size == 1)
      val n2 = partFiles(tiers.head)
      assert(n2 >= 8, s"post-restart major rewrite ignored the persisted part size: $n2 files")
      assert(e2.sql("SELECT COUNT(*) FROM zt").rows.head.head == "26000")
    }
  }

  test("optimize under a paused scheduler defers, and resume drains it z-ordered") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      assert(e.sql(ddl).ok)
      e.batchPut("zt", (1 to 2000).map(i => row(i.toLong)))
      e.forceFlush("zt")
      e.pauseCompaction()
      try {
        assert(e.optimizeZorder("zt", Seq("x", "y")) == "deferred")
        // layout recorded immediately, rewrite deferred
        assert(e.storeOf("zt").layout == Vector("x", "y"))
        assert(!e.storeOf("zt").coldDirs.exists(t =>
          java.nio.file.Paths.get(t).getFileName.toString.startsWith("tier-z")))
      } finally e.resumeCompaction()
      // the drained rewrite converges even from a SINGLE pk-sorted
      // tier (the needsLayout clause in the bottom-rewrite no-op guard)
      val tiers = e.storeOf("zt").coldDirs
      assert(tiers.size == 1 &&
        java.nio.file.Paths.get(tiers.head).getFileName.toString.startsWith("tier-z"),
        s"resume must drain the deferred OPTIMIZE z-ordered, got $tiers")
      // and a repeat admin compact of the laid-out single tier is free
      val beforeDirs = e.storeOf("zt").coldDirs
      e.compact("zt")
      assert(e.storeOf("zt").coldDirs == beforeDirs)
    }
  }

  test("LAYOUTAUTO: drift past the opt-in threshold folds without an admin call, honoring pause/resume") {
    withDir { dir =>
      val e = new Engine(spark, Some(dir), compactTrigger = 100)
      assert(e.sql(ddl).ok)
      for (chunk <- 0 until 2) {
        e.batchPut("zt", (1 to 6000).map(j => row((chunk * 6000 + j).toLong)))
        e.forceFlush("zt")
      }
      // declare the layout WITH the auto threshold through the SQL
      // front — one statement opts the table into self-maintenance
      assert(e.sql("OPTIMIZE zt ZORDER BY (x, y) PARTSIZE 32768 AUTO 16384").ok)
      def unlaid(): Long = e.stats.tables.find(_.name == "zt").get.unlaidBytes
      assert(unlaid() == 0L)
      // ingest past the threshold: the post-flush trigger folds
      // inline — drift returns to zero with NO admin call
      e.batchPut("zt", (12001 to 14000).map(i => row(i.toLong)))
      e.forceFlush("zt")
      assert(unlaid() == 0L, "auto fold must clear drift without an admin call")
      assert(e.sql("SELECT COUNT(*) FROM zt").rows.head.head == "14000")
      // under pause the trigger RECORDS through the deferred queue
      // (the scheduler contract); resume drains it z-ordered
      e.pauseCompaction()
      e.batchPut("zt", (14001 to 16000).map(i => row(i.toLong)))
      e.forceFlush("zt")
      assert(unlaid() > 0L, "paused: drift stays observable, fold deferred")
      assert(e.pendingCompactions >= 1, "paused: the fold is recorded, not run")
      e.resumeCompaction()
      assert(unlaid() == 0L, "resume must drain the deferred fold z-ordered")
      assert(e.sql("SELECT COUNT(*) FROM zt").rows.head.head == "16000")
      e.pauseCompaction() // quiesce so restart below sees a stable dir
      e.resumeCompaction()
      // the threshold persists with the layout (manifest LAYOUTAUTO):
      // a restarted engine keeps self-folding
      val e2 = new Engine(spark, Some(dir), compactTrigger = 100)
      e2.batchPut("zt", (16001 to 18000).map(i => row(i.toLong)))
      e2.forceFlush("zt")
      assert(e2.stats.tables.find(_.name == "zt").get.unlaidBytes == 0L,
        "LAYOUTAUTO must survive restart (manifest line)")
      assert(e2.sql("SELECT COUNT(*) FROM zt").rows.head.head == "18000")
      // below-threshold ingest does NOT fold (the opt-in is a bound,
      // not fold-per-flush): a tiny flush leaves its drift in place
      e2.batchPut("zt", Seq(row(18001L)))
      e2.forceFlush("zt")
      assert(e2.stats.tables.find(_.name == "zt").get.unlaidBytes > 0L,
        "a sub-threshold flush must not trigger the fold")
    }
  }
}
