package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sf1 scaling measurement (BENCH_sf1) is only honest if the
  * scale-up preserves the statistical structure the slow queries
  * measure — these gates pin GenScale's claims on a small input:
  * copies multiply rows exactly, key spaces never collide, joins
  * hold within a copy, the exact-duplicate RATE stays constant
  * (letter substitution keeps copies' shingle spaces disjoint), and
  * events copies replicate session structure verbatim onto disjoint
  * users in disjoint 400-day-shifted time ranges.
  */
class GenScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val src = "/root/testdata/sf0.001"

  test("GenScale multiplies rows, keeps keys disjoint, and preserves dup structure") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(src)))
    val out = java.nio.file.Files.createTempDirectory("graft-genscale").toString
    try {
      GenScale.main(Array(src, out, "3"))

      def n(dir: String, t: String): Long = Tables.t(spark, dir, t).count()
      for (t <- Seq("documents", "embeddings", "events", "orders", "lineitem",
                    "customer", "supplier", "part"))
        assert(n(out, t) == 3 * n(src, t), s"$t not exactly 3x")
      for (t <- Seq("region", "nation"))
        assert(n(out, t) == n(src, t), s"dim $t must copy as-is")

      // key spaces disjoint across copies, unique where source unique
      val docs = Tables.t(spark, out, "documents")
      assert(docs.select(col("doc_id")).distinct().count() == n(out, "documents"))

      // joins hold within a copy: every order resolves its customer
      val dangling = Tables.t(spark, out, "orders").as("o")
        .join(Tables.t(spark, out, "customer").as("c"),
          col("o.o_custkey") === col("c.c_custkey"), "left_anti").count()
      assert(dangling == 0, s"$dangling orders lost their customer")

      // dup RATE preserved: exact-dup surplus scales by exactly the
      // copy count (naive duplication would make it ~2/3 of all rows)
      def surplus(dir: String): Long = {
        val d = Tables.t(spark, dir, "documents")
        d.count() - d.select(md5(col("text"))).distinct().count()
      }
      assert(surplus(out) == 3 * surplus(src),
        s"dup surplus ${surplus(out)} != 3 x ${surplus(src)}")

      // substitution preserves length (n_chars stays truthful)
      assert(docs.filter(length(col("text")) =!= col("n_chars")).count() == 0)

      // events remain readable via the unit-aware loader and keep
      // their timestamp values (copy 0 ≡ source)
      val ev0 = Tables.t(spark, src, "events").select(col("event_id"), col("ts"))
      val evS = Tables.t(spark, out, "events").select(col("event_id"), col("ts"))
      assert(ev0.except(evS).count() == 0, "copy-0 events lost or ts-shifted")

      // time-dilation: copy 1 is copy 0 shifted exactly 400 days onto
      // disjoint users — per-user session/gap structure replicates
      // verbatim, so sessionize/as-of carriers measure scaling, not a
      // structure change
      val stride = GenScale.Stride
      val c0 = Tables.t(spark, src, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
      val c1 = Tables.t(spark, out, "events")
        .filter(col("user_id") >= stride && col("user_id") < 2 * stride)
        .select((col("user_id") - stride).as("user_id"),
          expr("timestampadd(DAY, -400, ts)").as("ts"), col("event_type"))
      assert(c1.except(c0).count() == 0 && c0.except(c1).count() == 0,
        "copy-1 events are not a 400-day-shifted replica of copy 0")

      // embedding copies must not collapse into a low-rank subspace:
      // hyperplane-LSH on the scaled corpus has to stay sub-quadratic
      // (the r10 regression: phase-only sin noise put all copies on a
      // rank-2 manifold -> ~2B buckets/table -> quadratic candidates).
      // Same n^2/20 bound VectorOpsSpec holds the index to at 1x.
      val idx = graft.queries.AnnIndex.lshIndex(spark, out)
      val nVec = n(out, "embeddings")
      val cand = idx.groupBy(col("tbl"), col("bucket")).count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).head.getDouble(0).toLong
      assert(cand <= nVec * nVec / 20,
        s"scaled-corpus LSH candidate pairs $cand vs n^2=${nVec * nVec} — degenerate noise")
    } finally graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(out))
  }

  test("substitutions stay distinct past the single-alphabet period (12 copies)") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(src)))
    val out = java.nio.file.Files.createTempDirectory("graft-genscale12").toString
    try {
      GenScale.main(Array(src, out, "12"))
      val d = Tables.t(spark, out, "documents")
      // a wrapped substitution family replays copy k-10 verbatim at
      // copy k, so the exact-dup surplus explodes past copies x src
      def surplus(df: org.apache.spark.sql.DataFrame): Long =
        df.count() - df.select(md5(col("text"))).distinct().count()
      val srcSurplus = {
        val s = Tables.t(spark, src, "documents")
        s.count() - s.select(md5(col("text"))).distinct().count()
      }
      assert(surplus(d) == 12 * srcSurplus,
        s"dup surplus ${surplus(d)} != 12 x $srcSurplus — substitution family wrapped")
    } finally graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(out))
  }
}
