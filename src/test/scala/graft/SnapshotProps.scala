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
        case Flush   => e.forceFlush("p")
        case Compact => e.compact("p")
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
}
