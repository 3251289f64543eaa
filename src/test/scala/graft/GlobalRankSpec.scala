package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalRank

/** The distributed two-phase rank must equal the single-partition
  * `row_number() OVER (ORDER BY score DESC, id)` definition EXACTLY —
  * under heavy ties (bucket edges must never split a tie), under
  * skew (one value carrying most of the relation), and in the
  * degenerate all-equal case where every percentile boundary
  * collapses. Plan-level: the window must be partitioned by the
  * derived bucket column, never a global single-partition window.
  */
class GlobalRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def reference(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val w = Window.orderBy(col("score").desc, col("id").asc)
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rnk")).toMap
  }

  private def ranked(df: org.apache.spark.sql.DataFrame,
                     buckets: Int): Map[Long, Long] =
    GlobalRank.withRank(df, col("score"), col("id"), "rnk", buckets)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rnk")).toMap

  test("exact parity with row_number under heavy ties") {
    import spark.implicits._
    // 5000 rows, only 17 distinct scores: every bucket edge lands on a tie
    val df = (1 to 5000).map(i => ((i * 2654435761L) % 5003, (i % 17).toDouble))
      .toDF("id", "score")
    assert(df.select(col("id")).distinct().count() == df.count(),
      "tie-break ids must be unique for a deterministic reference")
    assert(ranked(df, 16) == reference(df))
  }

  test("exact parity under 90% single-value skew") {
    import spark.implicits._
    val df = (1L to 3000L)
      .map(i => (i, if (i % 10 == 0) i.toDouble else 42.0))
      .toDF("id", "score")
    assert(ranked(df, 16) == reference(df))
  }

  test("all-equal scores collapse to one bucket but rank by tie id") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, 7.0)).toDF("id", "score")
    val r = ranked(df, 8)
    assert(r == (1L to 100L).map(i => i -> i).toMap)
  }

  test("window is partitioned by the derived bucket, not global") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, (i % 100).toDouble)).toDF("id", "score")
    val plan = GlobalRank.withRank(df, col("score"), col("id"), "rnk", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bkt"), plan.take(1500))
  }

  test("self-defending persist: upstream derivation is computed once") {
    import spark.implicits._
    // An expensive upstream is simulated by an accumulator that counts
    // per-partition evaluations. Without the operator's own persist the
    // three passes (boundaries, counts, final plan) would evaluate every
    // partition three times; with it, the boundary pass materializes the
    // cache and the later passes read it.
    val acc = spark.sparkContext.longAccumulator("upstream-evals")
    val base = (1L to 2000L).map(i => (i, (i % 37).toDouble))
      .toDF("id", "score").repartition(4)
    val upstream = base.as[(Long, Double)]
      .mapPartitions { it => acc.add(1); it }
      .toDF("id", "score")
    val out = GlobalRank.withRank(upstream, col("score"), col("id"), "rnk", 8)
    assert(out.count() == 2000L)
    assert(acc.value == 4,
      s"upstream partitions evaluated ${acc.value} times across 4 partitions " +
        "— the operator must persist an unpersisted input so the three " +
        "passes share one computation")
    assert(out.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rnk"))
      .toMap == reference(base))
  }

  test("an already-persisted input is not re-persisted (caller contract)") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, (i % 7).toDouble)).toDF("id", "score")
      .persist()
    try {
      assert(ranked(df, 8) == reference(df))
      assert(df.storageLevel.useMemory, "caller's persist must survive")
    } finally df.unpersist()
  }

  /** Walk the cause chain for the loud-failure message instead of
    * assuming a concrete exception type: the check lives in the
    * fused counts job and its wrapper may change with the operator's
    * internals (driver-side require today; a task-side raise would
    * arrive wrapped in SparkException).
    */
  private def chainMessages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("null scores fail loudly instead of mis-ranking") {
    import spark.implicits._
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(1.0)))
      .toDF("id", "score")
    val e = intercept[Exception] {
      GlobalRank.withRank(df, col("score"), col("id"), "rnk", 4).collect()
    }
    assert(chainMessages(e).contains("null or NaN"), chainMessages(e))
  }

  test("NaN scores fail loudly instead of mis-ranking") {
    import spark.implicits._
    val df = Seq((1L, 2.0), (2L, Double.NaN), (3L, 1.0)).toDF("id", "score")
    val e = intercept[Exception] {
      GlobalRank.withRank(df, col("score"), col("id"), "rnk", 4).collect()
    }
    assert(chainMessages(e).contains("null or NaN"), chainMessages(e))
  }

  test("withRanks: fused multi-signal sketch matches the per-signal definition") {
    import spark.implicits._
    val a = (1L to 2000L).map(i => (i, ((i * 37) % 211).toDouble)).toDF("id", "score")
    val b = (1L to 1500L).map(i => (i, ((i * 13) % 97).toDouble)).toDF("id", "score")
    val Seq(ra, rb) = GlobalRank.withRanks(Seq(
      (a, col("score"), col("id"), "rnk"),
      (b, col("score"), col("id"), "rnk")), 8)
    assert(ra.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rnk"))
      .toMap == reference(a))
    assert(rb.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rnk"))
      .toMap == reference(b))
  }

  test("withRanks: two fused signals cost no more scalar jobs than one") {
    import spark.implicits._
    // AQE turns one collect into several scheduler jobs (one per
    // shuffle stage), so the gate is COMPARATIVE: the tagged-union
    // fusion means N signals share the single-signal job budget —
    // per-signal sketch/count jobs would double it.
    def jobsUnder(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      // the status store is fed asynchronously — poll until stable
      def n() = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      var prev = -1; var cur = n()
      val deadline = System.nanoTime() + 10e9.toLong
      while (cur != prev && System.nanoTime() < deadline) {
        prev = cur; Thread.sleep(200); cur = n()
      }
      cur
    }
    val a = (1L to 1000L).map(i => (i, ((i * 7) % 31).toDouble)).toDF("id", "score")
    val b = (1L to 800L).map(i => (i, ((i * 11) % 13).toDouble)).toDF("id", "score")
    val c = (1L to 1000L).map(i => (i, ((i * 7) % 31).toDouble)).toDF("id", "score")
    val one = jobsUnder("grank-one") {
      GlobalRank.withRanks(Seq((c, col("score"), col("id"), "rnk")), 8)
    }
    var ranked: Seq[org.apache.spark.sql.DataFrame] = null
    val two = jobsUnder("grank-two") {
      ranked = GlobalRank.withRanks(Seq(
        (a, col("score"), col("id"), "rnk"),
        (b, col("score"), col("id"), "rnk")), 8)
    }
    assert(two <= one,
      s"fused two-signal withRanks ran $two scalar-phase jobs vs $one for one signal " +
        "— the tagged union must amortize, not multiply, the scalar jobs")
    // and the fused plans still rank correctly
    assert(ranked.head.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rnk"))
      .toMap == reference(a))
    assert(ranked(1).collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rnk"))
      .toMap == reference(b))
  }

  test("releaseCaches frees operator-owned persists, never caller-owned") {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    // operator-owned: withRank persists this one itself
    val ownedIn = (1L to 300L).map(i => (i, (i % 5).toDouble)).toDF("id", "score")
    val out = GlobalRank.withRank(ownedIn, col("score"), col("id"), "rnk", 4)
    assert(out.count() == 300L)
    // caller-owned: persisted before the call, must survive release
    val callerIn = (1L to 300L).map(i => (i, (i % 3).toDouble)).toDF("id", "score")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      GlobalRank.withRank(callerIn, col("score"), col("id"), "rnk", 4).count()
      assert(ownedIn.storageLevel != StorageLevel.NONE,
        "precondition: withRank persisted its input")
      GlobalRank.releaseCaches()
      assert(ownedIn.storageLevel == StorageLevel.NONE,
        "operator-owned persist must be freed by releaseCaches")
      assert(callerIn.storageLevel != StorageLevel.NONE,
        "caller-owned persist must survive releaseCaches")
      // the released plan still computes correctly (degrades to recompute)
      assert(out.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rnk"))
        .toMap == reference(ownedIn))
      // a second release is a harmless no-op
      GlobalRank.releaseCaches()
    } finally callerIn.unpersist()
  }
}
