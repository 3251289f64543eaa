package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join edge semantics: inclusive match at equal timestamps,
  * null when nothing precedes, always the greatest matching ts, keys
  * never cross.
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("matches greatest right ts <= left ts, inclusive, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")),  // before any right → null
      (2L, 10L, ts("2026-01-01 11:00:00")),  // equal ts → inclusive match
      (3L, 10L, ts("2026-01-01 12:30:00")),  // between rights → earlier one
      (4L, 10L, ts("2026-01-01 14:00:00")),  // after all → latest
      (5L, 20L, ts("2026-01-01 13:00:00"))   // other key: only its own rights
    ).toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 11:00:00")),
      (10L, ts("2026-01-01 12:00:00")),
      (10L, ts("2026-01-01 13:00:00")),
      (20L, ts("2026-01-01 01:00:00"))
    ).toDF("k", "ts")
    val got = AsOfJoin.asOf(left, right, "k", "ts", "m")
      .select("id", "m").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1)).map(_.toString)).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains("2026-01-01 11:00:00.0"))
    assert(got(3L).contains("2026-01-01 12:00:00.0"))
    assert(got(4L).contains("2026-01-01 13:00:00.0"))
    assert(got(5L).contains("2026-01-01 01:00:00.0"))
  }

  test("forward matches smallest right ts >= left ts, inclusive, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")),  // before all rights → earliest
      (2L, 10L, ts("2026-01-01 11:00:00")),  // equal ts → inclusive match
      (3L, 10L, ts("2026-01-01 12:30:00")),  // between rights → later one
      (4L, 10L, ts("2026-01-01 14:00:00")),  // after all → null
      (5L, 20L, ts("2026-01-01 00:30:00"))   // other key: only its own rights
    ).toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 11:00:00")),
      (10L, ts("2026-01-01 12:00:00")),
      (10L, ts("2026-01-01 13:00:00")),
      (20L, ts("2026-01-01 01:00:00"))
    ).toDF("k", "ts")
    val got = AsOfJoin.asOf(left, right, "k", "ts", "m", forward = true)
      .select("id", "m").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1)).map(_.toString)).toMap
    assert(got(1L).contains("2026-01-01 11:00:00.0"))
    assert(got(2L).contains("2026-01-01 11:00:00.0"))
    assert(got(3L).contains("2026-01-01 13:00:00.0"))
    assert(got(4L).isEmpty)
    assert(got(5L).contains("2026-01-01 01:00:00.0"))
  }

  test("tolerance nulls matches past the horizon, keeps those inside") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2026-01-01 12:00:00")),  // match 1h back → inside 2h
      (2L, 10L, ts("2026-01-01 23:00:00"))   // match 12h back → outside 2h
    ).toDF("id", "k", "ts")
    val right = Seq((10L, ts("2026-01-01 11:00:00"))).toDF("k", "ts")
    val got = AsOfJoin.asOf(left, right, "k", "ts", "m",
        toleranceMs = Some(2L * 3600 * 1000))
      .select("id", "m").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1)).map(_.toString)).toMap
    assert(got(1L).contains("2026-01-01 11:00:00.0"))
    assert(got(2L).isEmpty, "a match older than the tolerance must null out")
  }

  test("left columns ride through unchanged") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts("2026-01-01 10:00:00"), "payload"))
      .toDF("id", "k", "ts", "extra")
    val right = Seq((7L, ts("2026-01-01 09:00:00"))).toDF("k", "ts")
    val row = AsOfJoin.asOf(left, right, "k", "ts").collect()(0)
    assert(row.getAs[String]("extra") == "payload")
    assert(row.getAs[Timestamp]("asof_ts").toString == "2026-01-01 09:00:00.0")
  }
}
