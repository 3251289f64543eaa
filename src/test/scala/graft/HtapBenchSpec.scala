package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ignition test for the mixed HTAP throughput harness: short run,
  * every phase must complete work, and the hot point-lookup path must
  * be orders of magnitude faster than the job-based cold path.
  */
class HtapBenchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("all phases execute and report positive throughput") {
    val dir = java.nio.file.Files.createTempDirectory("graft-htap-spec").toString
    try {
      val phases = HtapBench.run(spark, dir, rows = 2000, secs = 1, threads = 4)
      assert(phases.map(_.name) ==
        Seq("point_hot", "point_cold", "agg_sum", "filtered_sum", "mixed_rw",
          "mixed_w_only", "mixed_point_only", "mixed_count_stable",
          "mixed_count_under_writes", "writes_during_compaction"))
      // writes_during_compaction lasts only as long as the tiny merge
      // at this scale — it may legitimately complete 0 batch puts
      phases.filterNot(_.name == "writes_during_compaction")
        .foreach(p => assert(p.ops > 0, s"phase ${p.name} did no work"))
      val hot = phases.find(_.name == "point_hot").get
      val cold = phases.find(_.name == "point_cold").get
      val agg = phases.find(_.name == "agg_sum").get
      // since the r5/r6 metadata + row caches, BOTH point paths are
      // driver-side (no Spark job): hot (in-memory map) still beats
      // cold (file-backed caches), but the orders-of-magnitude gap is
      // now between any point path and the job-based OLAP phases —
      // asserting hot >> cold would re-demand the pre-cache design
      // (and flaked under parallel-suite CPU contention)
      assert(hot.opsPerSec > cold.opsPerSec,
        s"hot ${hot.opsPerSec} not > cold ${cold.opsPerSec}")
      // r10: the no-WHERE aggregate is answered from tier stats
      // driver-side (A5) — no longer a job-based phase. The verdict
      // gate is >= 100 ops/s; driver-side it runs orders above, so
      // assert the gate with real headroom rather than a brittle
      // ratio against the point paths.
      assert(agg.opsPerSec >= 1000,
        s"stats-path agg ${agg.opsPerSec} below the >=100 ops/s gate (asserted at 1000 for headroom)")
    } finally {
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }
}
