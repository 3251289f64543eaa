package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Writes `.explain("formatted")` output for declared queries to files —
  * the measurement artifact for plan-shape claims (optimization guide §1:
  * capture the plan before and after every change, check Exchange count,
  * join strategy, PushedFilters/ReadSchema).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [q_a,q_b,...]
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [q_a,q_b,...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val only: Option[Set[String]] =
      if (args.length >= 3) Some(args(2).split(",").map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"[plandump] $name ok (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          // a query that plans only after a prior action (multi-job
          // pipelines) still gets a file naming the failure, so the
          // sweep is auditable
          java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"),
            s"PLAN UNAVAILABLE: ${e.getClass.getName}: ${e.getMessage}\n")
          println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
