package graft

import org.apache.spark.sql.SparkSession

import graft.engine.Engine

/** Scaling harness for the INCREMENTAL OPTIMIZE claim (r17 directive
  * 3): rewrite bytes are proportional to data INGESTED since the last
  * OPTIMIZE, never to table size. ZOrderOptimizeSpec gates the
  * mechanism at one size; this main measures the CURVE — the same
  * fixed-size ingest batch folded into tables 1×/10×/30× apart — and
  * emits one JSON line per scale:
  *
  *   {"scale":N,"tableBytes":...,"driftBytes":...,"rewrittenBytes":...,
  *    "rewriteOverTable":...,"fullMs":...,"incMs":...}
  *
  * The claim holds when rewrittenBytes tracks driftBytes (the flushed
  * dirty tier, stats.unlaidBytes) and rewriteOverTable FALLS ~linearly
  * with scale — at 30× the fold touches ~1/30th of what a full
  * rewrite would. Run via `runMain graft.OptimizeBench [outFile]`;
  * the result is committed as a pin-style artifact (OPTIMIZE_r17.json)
  * no driver run overwrites.
  */
object OptimizeBench {

  // the ZOrderOptimizeSpec fixture shape: x and y decorrelated from
  // the pk and from each other, so pk-sorted files never prune a
  // 2-D box and the z rewrite is genuinely load-bearing
  private def row(id: Long): Array[Any] =
    Array[Any](id, (id * 2654435761L) % 4096L, (id * 40503L) % 4096L, "p" * 48)

  private def treeBytes(paths: Seq[String]): Long =
    paths.map { p =>
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try walk.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size(_)).sum
      finally walk.close()
    }.sum

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("OPTIMIZE_r17.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-optimize-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val baseRows = 60000       // 2.5× the spec fixture at 1× — 1.8M rows at 30×
    val ingestRows = 2000      // FIXED across scales — the whole point
    val lines = Seq(1, 10, 30).map { scale =>
      val dir = java.nio.file.Files.createTempDirectory("graft-optbench").toString
      try {
        val e = new Engine(spark, Some(dir), compactTrigger = 1000)
        require(e.sql(
          "CREATE TABLE zt (id BIGINT NOT NULL, x BIGINT, y BIGINT, pad VARCHAR(64))").ok)
        val n = baseRows.toLong * scale
        // 4 flushed tiers at any scale, like the spec fixture
        val chunk = n / 4
        for (c <- 0L until 4L) {
          e.batchPut("zt",
            ((c * chunk + 1) to ((c + 1) * chunk)).map(row))
          e.forceFlush("zt")
        }
        val t0 = System.nanoTime()
        require(e.optimizeZorder("zt", Seq("x", "y")) == "rewritten")
        val fullMs = (System.nanoTime() - t0) / 1e6
        val store = e.storeOf("zt")
        val laidTiers = store.synchronized(store.coldDirs)
        val tableBytes = treeBytes(laidTiers)

        // the fixed-size ingest, then the incremental fold
        e.batchPut("zt", ((n + 1) to (n + ingestRows)).map(row))
        e.forceFlush("zt")
        val drift = e.stats.tables.find(_.name == "zt").get.unlaidBytes
        val t1 = System.nanoTime()
        require(e.optimizeZorder("zt", Seq("x", "y")) == "rewritten")
        val incMs = (System.nanoTime() - t1) / 1e6
        val after = store.synchronized(store.coldDirs)
        require(laidTiers.forall(after.contains),
          "incremental OPTIMIZE must keep every already-laid-out tier")
        val rewritten = treeBytes(after.filterNot(laidTiers.contains))
        val drift2 = e.stats.tables.find(_.name == "zt").get.unlaidBytes
        require(drift2 == 0L, s"drift must clear, got $drift2")
        f"""{"scale":$scale,"tableBytes":$tableBytes,"driftBytes":$drift,"rewrittenBytes":$rewritten,"rewriteOverTable":${rewritten.toDouble / tableBytes}%.5f,"fullMs":$fullMs%.1f,"incMs":$incMs%.1f}"""
      } finally graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
    }
    val head = try {
      val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD").start()
      val o = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      p.waitFor(); if (o.matches("[0-9a-f]{6,40}")) o else "unknown"
    } catch { case _: Throwable => "unknown" }
    val doc = lines.mkString(
      s"""{"metric":"optimize_incremental_scaling","head":"$head","at":"${java.time.Instant.now()}","scales":[""",
      ",", "]}")
    println(doc)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc + "\n")
    spark.stop()
  }
}
