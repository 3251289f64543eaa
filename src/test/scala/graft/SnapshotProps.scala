package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.engine.Engine

/** Property gate for the LWW snapshot (SURVEY §5.3): any interleaving
  * of insert/update/delete — with flushes and compactions injected at
  * arbitrary points — must leave the snapshot equal to a naive
  * last-writer-wins map, and restart must reproduce it.
  */
object SnapshotProps extends Properties("snapshot") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15).withMaxDiscardRatio(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  sealed trait Op
  case class Ins(pk: Int, v: Int) extends Op
  case class Upd(pk: Int, v: Int) extends Op
  case class Del(pk: Int) extends Op
  case object Flush extends Op
  case object Compact extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> (for { k <- Gen.choose(1, 6); v <- Gen.choose(0, 99) } yield Ins(k, v)),
    3 -> (for { k <- Gen.choose(1, 6); v <- Gen.choose(100, 199) } yield Upd(k, v)),
    2 -> Gen.choose(1, 6).map(Del(_)),
    2 -> Gen.const(Flush),
    1 -> Gen.const(Compact))

  private val genOps: Gen[List[Op]] = Gen.listOfN(14, genOp)

  private def runScenario(ops: List[Op], restart: Boolean): Prop = {
    val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
    try {
      val e = new Engine(spark, Some(dir), compactTrigger = 99)
      assert(e.sql("CREATE TABLE p (id BIGINT NOT NULL, v INT)").ok)
      val model = scala.collection.mutable.HashMap.empty[Int, Int]
      ops.foreach {
        case Ins(k, v) =>
          assert(e.sql(s"INSERT INTO p VALUES ($k, $v)").ok)
          model(k) = v
        case Upd(k, v) =>
          val n = e.sql(s"UPDATE p SET v = $v WHERE id = $k").rowsAffected
          assert(n == (if (model.contains(k)) 1 else 0))
          if (model.contains(k)) model(k) = v
        case Del(k) =>
          val n = e.sql(s"DELETE FROM p WHERE id = $k").rowsAffected
          assert(n == (if (model.contains(k)) 1 else 0))
          model.remove(k)
        case Flush      => e.forceFlush("p")
        case Compact    => e.compact("p")
        case InsNull(_) => () // agg-scenario op; not generated here
      }
      val eng = if (restart) new Engine(spark, Some(dir), compactTrigger = 99) else e
      val got = eng.sql("SELECT id, v FROM p").rows
        .map(r => r(0).toInt -> r(1).toInt).toMap
      Prop(got == model.toMap) :| s"got=$got model=$model ops=$ops"
    } finally graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  property("snapshot equals naive LWW model under flush/compact") =
    forAll(genOps)(ops => runScenario(ops, restart = false))

  property("snapshot survives restart (log replay + manifest)") =
    forAll(genOps)(ops => runScenario(ops, restart = true))

  // ---- A5 stats-path gate ---------------------------------------------------
  // The no-job aggregate path must be BYTE-IDENTICAL (at the ResultSet
  // surface) to the Spark-job path under any interleaving of writes,
  // tombstones, null columns, flushes and compactions — including the
  // hot-shadows-cold and shadow-was-the-extreme cases the fold has to
  // either resolve or punt on.

  /** Ins with a NULL in the aggregated columns (COUNT(col) must still
    * count the row — reference no-null-skip quirk; SUM/MIN/MAX must
    * skip it on both paths).
    */
  case class InsNull(pk: Int) extends Op

  private val genAggOp: Gen[Op] = Gen.frequency(
    5 -> (for { k <- Gen.choose(1, 6); v <- Gen.choose(-99, 99) } yield Ins(k, v)),
    2 -> (for { k <- Gen.choose(1, 6); v <- Gen.choose(100, 199) } yield Upd(k, v)),
    2 -> Gen.choose(1, 6).map(Del(_)),
    1 -> Gen.choose(7, 9).map(InsNull(_)),
    2 -> Gen.const(Flush),
    1 -> Gen.const(Compact))

  private val genAggOps: Gen[List[Op]] = Gen.listOfN(14, genAggOp)

  private def runAggScenario(ops: List[Op]): Prop = {
    val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
    try {
      val e = new Engine(spark, Some(dir), compactTrigger = 99)
      assert(e.sql("CREATE TABLE pa (id BIGINT NOT NULL, v INT, d DOUBLE)").ok)
      ops.foreach {
        case Ins(k, v)  => assert(e.sql(s"INSERT INTO pa VALUES ($k, $v, ${v * 0.5 + 0.01})").ok)
        case Upd(k, v)  => e.sql(s"UPDATE pa SET v = $v, d = ${v * 0.25 + 0.01} WHERE id = $k")
        case Del(k)     => e.sql(s"DELETE FROM pa WHERE id = $k")
        case InsNull(k) => assert(e.sql(s"INSERT INTO pa (id) VALUES ($k)").ok)
        case Flush      => e.forceFlush("pa")
        case Compact    => e.compact("pa")
      }
      val stmts = Seq("COUNT(*)", "COUNT(v)", "SUM(v)", "AVG(v)", "MIN(v)", "MAX(v)",
        "SUM(d)", "AVG(d)", "MIN(d)", "MAX(d)")
      stmts.map { f =>
        e.statsAggEnabled = true
        val fast = e.sql(s"SELECT $f FROM pa")
        e.statsAggEnabled = false
        val slow = e.sql(s"SELECT $f FROM pa")
        e.statsAggEnabled = true
        Prop(fast.ok && slow.ok && fast.headers == slow.headers && fast.rows == slow.rows) :|
          s"$f fast=${fast.rows} slow=${slow.rows} ops=$ops"
      }.reduce(_ && _)
    } finally graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  property("stats-path aggregates equal the Spark path under flush/compact/null/tombstone") =
    forAll(genAggOps)(runAggScenario)

  // ---- snapshot-cache gate --------------------------------------------------
  // The version-keyed cached snapshot must equal a freshly built one
  // after EVERY write-path op — put, DML, flush, compact — i.e. no
  // write path may forget to bump the content version.

  private def runCacheScenario(ops: List[Op]): Prop = {
    val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
    try {
      val e = new Engine(spark, Some(dir), compactTrigger = 99)
      assert(e.sql("CREATE TABLE pc (id BIGINT NOT NULL, v INT)").ok)
      val model = scala.collection.mutable.HashMap.empty[Int, Int]
      val checks = ops.map { op =>
        op match {
          case Ins(k, v) => e.sql(s"INSERT INTO pc VALUES ($k, $v)"); model(k) = v
          case Upd(k, v) => e.sql(s"UPDATE pc SET v = $v WHERE id = $k")
            if (model.contains(k)) model(k) = v
          case Del(k)     => e.sql(s"DELETE FROM pc WHERE id = $k"); model.remove(k)
          case InsNull(_) => ()
          case Flush      => e.forceFlush("pc")
          case Compact    => e.compact("pc")
        }
        val got = e.snapshotCached("pc").collect()
          .map(r => r.getLong(0).toInt -> r.getInt(1)).toMap
        // the SAME dialect statement each iteration: its memoized
        // result must be invalidated by every write-path op too
        val viaSql = e.sql("SELECT id, v FROM pc").rows
          .map(r => r(0).toInt -> r(1).toInt).toMap
        // snapshot the MUTABLE model NOW: Prop and :| evaluate
        // deferred, so comparing against `model` directly would pit
        // each iteration's reads against the scenario's FINAL state
        // (every multi-op scenario falsified spuriously)
        val m = model.toMap
        (Prop(got == m) :| s"after $op cached=$got model=$m ops=$ops") &&
          (Prop(viaSql == m) :| s"after $op resultCache=$viaSql model=$m ops=$ops")
      }
      checks.reduce(_ && _)
    } finally graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  property("cached snapshot invalidates on every write path") =
    forAll(genOps)(runCacheScenario)
}
