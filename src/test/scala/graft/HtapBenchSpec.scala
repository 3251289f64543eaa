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
        Seq("point_hot", "point_cold", "agg_sum", "filtered_sum", "mixed_rw"))
      phases.foreach(p => assert(p.ops > 0, s"phase ${p.name} did no work"))
      val hot = phases.find(_.name == "point_hot").get
      val cold = phases.find(_.name == "point_cold").get
      // the driver-side hot path must beat the Spark-job cold path
      assert(hot.opsPerSec > cold.opsPerSec * 10,
        s"hot ${hot.opsPerSec} not >> cold ${cold.opsPerSec}")
    } finally {
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }
}
