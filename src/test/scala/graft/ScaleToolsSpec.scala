package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bucketing, SkewTools}

/** The scale utilities must deliver their plan-level promises, not
  * just correct values: bucketed joins with zero exchanges, salted
  * aggregation identical to direct groupBy, salted joins identical to
  * plain joins.
  */
class ScaleToolsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
  }

  test("bucketed co-located join plans with no Exchange") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i % 50, s"f$i")).toDF("k", "payload")
    val dims = (0 until 50).map(i => (i, s"d$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", "k", 8)
    Bucketing.writeBucketed(dims, "b_dims", "k", 8)
    try {
      val joined = Bucketing.cogroupJoin(spark, "b_facts", "b_dims", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("saltedAgg equals direct groupBy on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one key — the canonical hot-key shape
    val df = (1 to 10000).map { i =>
      (if (i % 10 == 0) i % 7 else 999, i.toLong)
    }.toDF("k", "v")
    val direct = df.groupBy(col("k")).agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = SkewTools.saltedAgg(df, col("k"), salts = 8,
      saltBy = Seq(col("v")), "s" -> sum(col("v")), "n" -> count(lit(1)))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == direct)
  }

  test("saltedJoin equals plain join, including hot keys") {
    import spark.implicits._
    val left = (1 to 5000).map(i => (if (i % 5 == 0) i % 3 else 42, i)).toDF("k", "lv")
    val right = (0 to 50).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val salted = SkewTools.saltedJoin(left, right, "k", salts = 8,
      leftSaltBy = Seq(col("lv"))).select("k", "lv", "rv").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
  }
}
