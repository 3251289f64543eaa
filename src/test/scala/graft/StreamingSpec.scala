package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.streaming.Streams

/** Streaming surface against in-memory sources: ingest-to-engine
  * freshness, watermarked window finalization, and stateful session
  * closing (by gap and by timeout).
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("streaming ingest lands micro-batches in the hot store (HTAP freshness)") {
    import spark.implicits._
    val e = new Engine(spark)
    assert(e.sql("CREATE TABLE sink (id BIGINT NOT NULL, name VARCHAR(50), amount DOUBLE)").ok)
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Double)]
    val q = Streams.ingest(e, "sink", src.toDF().toDF("id", "name", "amount"))
    try {
      src.addData((1L, "a", 1.5), (2L, "b", 2.5))
      q.processAllAvailable()
      assert(e.sql("SELECT COUNT(*) FROM sink").rows.head.head == "2")
      // next batch is visible immediately after commit; same-PK row upserts
      src.addData((2L, "b2", 9.0), (3L, "c", 3.0))
      q.processAllAvailable()
      assert(e.sql("SELECT COUNT(*) FROM sink").rows.head.head == "3")
      assert(e.sql("SELECT name FROM sink WHERE id = 2").rows.head.head == "b2")
    } finally q.stop()
  }

  test("replayed ingest batch leaves the queryable snapshot unchanged (idempotence)") {
    import spark.implicits._
    val e = new Engine(spark)
    assert(e.sql("CREATE TABLE rply (id BIGINT NOT NULL, name VARCHAR(50), amount DOUBLE)").ok)
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Double)]
    val q = Streams.ingest(e, "rply", src.toDF().toDF("id", "name", "amount"))
    try {
      val batch = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      src.addData(batch: _*)
      q.processAllAvailable()
      val before = e.sql("SELECT id, name, amount FROM rply").rows.sortBy(_.head)
      val store = e.storeOf("rply")
      val versionsBefore = store.synchronized(store.log.size)
      // simulate foreachBatch's failure-replay: the sink re-applies the
      // SAME micro-batch through the same write path (at-least-once)
      e.batchPut("rply", batch.map(t => Array[Any](t._1, t._2, Double.box(t._3))))
      val after = e.sql("SELECT id, name, amount FROM rply").rows.sortBy(_.head)
      assert(after == before, "replayed batch changed the queryable snapshot")
      assert(e.sql("SELECT COUNT(*) FROM rply").rows.head.head == "3")
      // the cost of the contract is version-history inflation, not
      // state divergence: the replay minted new seqs for the same pks
      assert(store.synchronized(store.log.size) == versionsBefore + batch.size,
        "replay should append new versions that the LWW snapshot resolves away")
      // and a live stream continues normally after the replay
      src.addData((4L, "d", 4.5))
      q.processAllAvailable()
      assert(e.sql("SELECT COUNT(*) FROM rply").rows.head.head == "4")
    } finally q.stop()
  }

  test("watermarked tumbling window finalizes once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String, Double)]
    val agg = Streams.windowedCounts(
      src.toDF().toDF("ts", "event_type", "value"),
      windowLen = "10 minutes", watermark = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win").outputMode(OutputMode.Append).start()
    try {
      src.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0), (ts(7), "view", 5.0))
      q.processAllAvailable()
      // watermark still inside the first window: nothing finalized
      assert(spark.sql("SELECT * FROM win").count() == 0)
      // an event at 10:26 pushes the watermark to 10:21 > both windows
      src.addData((ts(26), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, sum_value FROM win ORDER BY event_type").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming dedup suppresses duplicate fingerprints within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Timestamp)]
    val deduped = Streams.dedupDocs(
      src.toDF().toDF("doc_id", "text", "ts"), watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append).start()
    try {
      // same text under different formatting = same fingerprint
      src.addData((1L, "Hello, World!", ts(0)), (2L, "hello  world", ts(1)),
        (3L, "fresh document", ts(2)))
      q.processAllAvailable()
      // a cross-batch duplicate within the watermark is suppressed too
      src.addData((4L, "HELLO world", ts(3)), (5L, "another one", ts(4)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dd").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 5L), s"got $ids")
    } finally q.stop()
  }

  test("streaming near-dup dedup suppresses banded-LSH collisions, keeps distinct docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // long doc + one-token mutation → near-identical shingle sets; the
    // expected keep set is derived from the SAME band keys computed in
    // batch (any band shared with an earlier doc = suppressed), so the
    // assertion is exact regardless of hash luck
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok30", "mutated")
    val distinct1 = (1 to 60).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base, ts(0)), (2L, base, ts(1)),      // exact dup of 1
      (3L, nearDup, ts(2)),                                    // near dup of 1
      (4L, distinct1, ts(3)), (5L, "tiny doc", ts(4)))         // distinct; shingle-less
    // exact expected keep set by simulating the chained per-band
    // dedup over the batch band keys: a doc is dropped at the first
    // stage whose key it has seen; it registers keys for every stage
    // it PASSED (it was their first occurrence), whether ultimately
    // kept or dropped — the transitively-suppressive chain semantics
    val bands = Streams.bandKeys(docs.toDF("doc_id", "text", "ts"))
      .select("doc_id", "band0", "band1", "band2", "band3")
      .collect().sortBy(_.getLong(0))
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong))
    val seen = Seq.fill(4)(scala.collection.mutable.Set.empty[Long])
    val expected = bands.flatMap { case (id, bs) =>
      (0 until 4).find(k => seen(k).contains(bs(k))) match {
        case Some(k) => (0 until k).foreach(j => seen(j) += bs(j)); None
        case None    => (0 until 4).foreach(j => seen(j) += bs(j)); Some(id)
      }
    }.toSet
    assert(expected.contains(1L) && !expected.contains(2L) && !expected.contains(3L),
      s"fixture should make docs 2,3 collide with 1: $expected")
    val src = MemoryStream[(Long, String, Timestamp)]
    val out = Streams.nearDedupDocs(
      src.toDF().toDF("doc_id", "text", "ts"), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ndd")
      .outputMode(OutputMode.Append).start()
    try {
      // one micro-batch per doc: arrival order (the truth's priority
      // order) is then deterministic — within a single batch the
      // survivor per band key is partition-order-dependent
      docs.foreach { d => src.addData(d); q.processAllAvailable() }
      val ids = spark.sql("SELECT doc_id FROM ndd").collect().map(_.getLong(0)).toSet
      assert(ids == expected, s"got $ids, batch-derived truth $expected")
    } finally q.stop()
  }

  test("streaming curation drops low-quality docs and in-horizon duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Timestamp)]
    val out = Streams.curateDocs(
      src.toDF().toDF("doc_id", "text", "ts"), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("cur")
      .outputMode(OutputMode.Append).start()
    try {
      val good = (1 to 20).map(i => s"w$i").mkString(" ")   // 20 tokens, no stopwords
      val short = "too few tokens"                           // < 10 tokens
      val stoppy = (1 to 20).map(_ => "the a and of").mkString(" ")  // stop_ratio 1.0
      src.addData((1L, good, ts(0)), (2L, short, ts(1)), (3L, stoppy, ts(2)))
      q.processAllAvailable()
      // a reformatted duplicate of the good doc inside the horizon
      src.addData((4L, good.toUpperCase + "  ", ts(3)), (5L, good + " extra", ts(4)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM cur").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 5L), s"got $ids")
    } finally q.stop()
  }

  test("near-dedup state ages out after the watermark advances (bounded state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the at-scale claim made in Streams.nearDedupDocs — per-band
    // dedup state is BOUNDED by the watermark horizon, not by stream
    // length — measured directly from the state-store metrics: rows
    // accumulate while events sit inside the horizon, then a far-
    // future event advances the watermark and the expired keys must
    // leave the store.
    val src = MemoryStream[(Long, String, Timestamp)]
    val out = Streams.nearDedupDocs(
      src.toDF().toDF("doc_id", "text", "ts"), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("nddstate")
      .outputMode(OutputMode.Append).start()
    try {
      val docs = (1 to 20).map(i =>
        (i.toLong, (1 to 10).map(t => s"w${i}_$t").mkString(" "), ts(i % 5)))
      src.addData(docs: _*)
      q.processAllAvailable()
      val before = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(before >= 20 * 4,
        s"expected ≥80 state rows (20 docs × 4 band stages), got $before")
      // two sentinels an hour ahead: the first advances the watermark
      // past every earlier key, the second's batch runs with that
      // watermark and evicts them
      src.addData((998L, "sentinel doc one far ahead", ts(60)))
      q.processAllAvailable()
      src.addData((999L, "sentinel doc two far ahead", ts(61)))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      info(s"state rows: $before before watermark advance, $after after")
      assert(after < before, s"state did not shrink: $before -> $after")
      assert(after <= 2 * 4,
        s"only the 2 in-horizon sentinels (× 4 stages) should remain, got $after")
    } finally q.stop()
  }

  test("sessionization closes sessions by inactivity gap and by timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Streams.Evt]
    val sess = Streams.sessionize(src.toDS(), gapMs = 5 * 60 * 1000L, watermark = "0 seconds")
    val q = sess.writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append).start()
    try {
      // user 1: events at 10:00, 10:02 (one session), then 10:20 (gap > 5m → closes first)
      src.addData(Streams.Evt(1L, ts(0)), Streams.Evt(1L, ts(2)))
      q.processAllAvailable()
      src.addData(Streams.Evt(1L, ts(20)))
      q.processAllAvailable()
      val afterGap = spark.sql("SELECT user_id, nEvents FROM sess").collect()
      assert(afterGap.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 2)))
      // advancing the watermark far past 10:20 times the open session out
      src.addData(Streams.Evt(2L, ts(50)))
      q.processAllAvailable()
      src.addData(Streams.Evt(2L, ts(55)))
      q.processAllAvailable()
      val all = spark.sql("SELECT user_id, nEvents FROM sess ORDER BY startMs").collect()
      assert(all.map(r => (r.getLong(0), r.getInt(1))).toSeq.contains((1L, 1)))
    } finally q.stop()
  }

  test("streaming decontamination drops every eval-gram-sharing doc, keeps the rest (stateless)") {
    import spark.implicits._
    // eval doc: 10-token run s1..s10 (3 full 8-grams) plus a marker
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val bloom = Streams.evalGramBloom(spark, Seq(shared + " epost").toDF("text"))
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Timestamp)]
    val out = Streams.decontaminateDocs(src.toDF().toDF("doc_id", "text", "ts"), bloom)
    val q = out.writeStream.format("memory").queryName("decontam_out")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(
        (1L, "clean " + (1 to 30).map(i => s"a$i").mkString(" "), ts(1)),    // unique grams → kept
        (2L, "leak here " + shared + " tail end", ts(2)),                    // carries eval 8-grams → dropped
        (3L, (1 to 7).map(i => s"s$i").mkString(" "), ts(3)))                // < 8 tokens, no gram → kept
      q.processAllAvailable()
      // a later batch through the SAME filter — stateless, so behavior
      // is identical regardless of stream position
      src.addData((4L, "another " + shared.replace("s5", "zz") + " variant", ts(4)))
      q.processAllAvailable()
      val kept = spark.table("decontam_out").select("doc_id").as[Long].collect().toSet
      // doc 4 breaks the run at s5: its longest eval-shared run is 4
      // tokens (< 8) on either side → no full 8-gram hit → kept
      assert(kept == Set(1L, 3L, 4L), kept)
    } finally q.stop()
  }

  test("streaming classifier verdicts and scores match the batch quality model exactly") {
    import spark.implicits._
    // the first 80 corpus docs streamed through the stateless scorer
    // must reproduce the batch q_quality_model verdicts row-for-row:
    // keep set identical, scores bit-identical (same integer weight
    // sum, same single division)
    val sfDir = "/root/testdata/sf0.01"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val batch = SparkEntry.queries("q_quality_model")(spark, sfDir)
      .filter($"doc_id" < 80)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"doc_id" < 80).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Timestamp)]
    val out = Streams.classifyDocs(src.toDF().toDF("doc_id", "text", "ts"))
    val q = out.writeStream.format("memory").queryName("classify_out")
      .outputMode(OutputMode.Append).start()
    try {
      // two separate batches — stateless, so split position is irrelevant
      val (a, b) = docs.splitAt(40)
      src.addData(a.map { case (id, t) => (id, t, ts(1)) }: _*)
      q.processAllAvailable()
      src.addData(b.map { case (id, t) => (id, t, ts(2)) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("classify_out")
        .select("doc_id", "score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val batchKept = batch.filter(_._2._2 == 1).keySet
      assert(streamed.keySet == batchKept,
        s"kept sets differ: stream-only ${streamed.keySet -- batchKept}, batch-only ${batchKept -- streamed.keySet}")
      streamed.foreach { case (id, sc) =>
        assert(sc == batch(id)._1, s"doc $id: stream score $sc != batch ${batch(id)._1}")
      }
    } finally q.stop()
  }

  test("streaming mixture emits exactly the batch copy multiset across split batches") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.01"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val batch = SparkEntry.queries("q_mix_weighted")(spark, sfDir)
      .filter($"doc_id" < 100)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"doc_id" < 100).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Timestamp)]
    val out = Streams.mixDocs(src.toDF().toDF("doc_id", "source", "ts"))
    val q = out.writeStream.format("memory").queryName("mix_out")
      .outputMode(OutputMode.Append).start()
    try {
      // stateless: the batch split position must not change the output
      val (a, b) = docs.splitAt(37)
      src.addData(a.map { case (id, s) => (id, s, ts(1)) }: _*)
      q.processAllAvailable()
      src.addData(b.map { case (id, s) => (id, s, ts(2)) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("mix_out")
        .select("doc_id", "copy_idx").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(streamed == batch,
        s"stream-only ${streamed -- batch}, batch-only ${batch -- streamed}")
    } finally q.stop()
  }

  test("stream-stream interval join attributes conversions inside the horizon only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, Timestamp)]
    val convs = MemoryStream[(Long, Long, Timestamp, Double)]
    val out = Streams.attributeConversions(
      views.toDF().toDF("user_id", "event_id", "ts"),
      convs.toDF().toDF("user_id", "event_id", "ts", "value"),
      horizonMin = 30, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: view at 10:00 — conversions at 10:05 (in horizon) and
      // 10:45 (outside); user 2: conversion at 10:03 with NO view;
      // user 3: view at 10:02, conversion arrives in a LATER batch
      views.addData((1L, 100L, ts(0)), (3L, 300L, ts(2)))
      convs.addData((1L, 500L, ts(5), 9.0), (1L, 501L, ts(45), 7.0),
        (2L, 502L, ts(3), 5.0))
      q.processAllAvailable()
      // the cross-batch pair: state from the view side must still be
      // live when the conversion lands
      convs.addData((3L, 503L, ts(20), 3.0))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("user_id", "view_id", "conv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 100L, 500L), (3L, 300L, 503L)), got)
      // the join is keyed + bracketed, so state stays watermark-bounded
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows > 0 && stateRows <= 12,
        s"interval-join state should hold only in-horizon rows, got $stateRows")
    } finally q.stop()
  }

  test("streaming heavy-hitters: sketch bounds hold per window, state stays sketch-sized") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String, Timestamp)]
    val trend = Streams.trendingTokens(
      src.toDF().toDF("doc_id", "text", "ts"),
      k = 3, windowLen = "10 minutes", watermark = "0 seconds")
    val q = trend.writeStream.format("memory").queryName("trend")
      .outputMode(OutputMode.Append).start()
    try {
      // window [10:00,10:10): alpha×12, beta×6, ten singletons → N=28,
      // the Misra–Gries guarantee threshold is N/(k+1)=7. Fed across
      // two batches to force a state-store sketch MERGE, not one pass.
      src.addData((1L, ("alpha " * 6 + "beta " * 3 + "c1 c2 c3 c4 c5").trim, ts(1)))
      q.processAllAvailable()
      src.addData((2L, ("alpha " * 6 + "beta " * 3 + "c6 c7 c8 c9 c10").trim, ts(2)))
      q.processAllAvailable()
      // no window finalized yet, and the open window holds ONE sketch row
      assert(spark.sql("SELECT * FROM trend").count() == 0)
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows >= 1 && stateRows <= 2,
        s"open-window state should be one sketch buffer, got $stateRows rows")
      // advance the watermark past the window end → it emits once
      src.addData((3L, "flush", ts(25)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT win_start, n_toks, tok, est FROM trend").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2), r.getLong(3)))
      assert(rows.nonEmpty && rows.forall(_._1 == ts(0)), rows.toSeq)
      assert(rows.forall(_._2 == 28L), rows.toSeq)
      assert(rows.length <= 3, s"sketch must emit <= k rows: ${rows.toSeq}")
      val exact = Map("alpha" -> 12L, "beta" -> 6L) ++
        (1 to 10).map(i => s"c$i" -> 1L)
      val est = rows.map(r => r._3 -> r._4).toMap
      // coverage: the one token above N/(k+1) must survive
      assert(est.contains("alpha"), est)
      // underestimate: never above the true count
      assert(est.forall { case (t, e) => e <= exact(t) }, est)
      // bounded error: underestimate by at most N/(k+1)
      assert(est.forall { case (t, e) => exact(t) - e <= 7L }, est)
    } finally q.stop()
  }

  test("streaming semantic dedup: batch-rule verdicts, transitive registration, watermark eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two-centroid codebook; 4-dim vectors with hand-computed verdicts
    val codebook: Seq[(Long, Seq[Double])] = Seq(
      10L -> Seq(1.0, 0.0, 0.0, 0.0), 20L -> Seq(0.0, 1.0, 0.0, 0.0))
    val wave: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(1.0, 0.05, 0.0, 0.0),    // cid 10, first -> keep
      2L -> Seq(0.99, 0.06, 0.0, 0.0),   // cid 10, ~dup of v1 -> drop
      3L -> Seq(0.0, 1.0, 0.0, 0.0),     // cid 20, first -> keep
      4L -> Seq(0.03, 0.98, 0.2, 0.0),   // cid 20, ~dup of v3 -> drop
      5L -> Seq(0.0, 0.1, 1.0, 0.0),     // cid 20, far from v3/v4 -> keep
      6L -> Seq(0.02, 0.97, 0.25, 0.0))  // cid 20, ~dup of DROPPED v4 -> drop (transitive)
    val expect = Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 1, 6L -> 0)

    val src = MemoryStream[(Long, Seq[Double], Timestamp)]
    val got = scala.collection.mutable.Map.empty[Long, (Long, Int, Int)]
    val q = Streams.semanticDedupVecs(
        src.toDF().toDF("vec_id", "v", "ts"), codebook, minCosine = 0.9)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Streams.SemOut], _: Long) =>
        b.collect().foreach(o => got(o.vec_id) = (o.cid, o.keep, o.state_rows)); ()
      }.start()
    try {
      // wave 1 split across two micro-batches — verdicts must not
      // depend on batch boundaries (state carries registrations over)
      val w1 = wave.zipWithIndex.map { case ((id, v), i) => (id, v, ts(i)) }
      src.addData(w1.take(3): _*); q.processAllAvailable()
      src.addData(w1.drop(3): _*); q.processAllAvailable()
      assert(got.view.mapValues(_._2).toMap == expect, got.toMap.toString)
      assert(got(1L)._1 == 10L && got(3L)._1 == 20L && got(5L)._1 == 20L)
      // v6 saw state {v3, v4, v5} -> state_rows 4 after registering
      assert(got(6L)._3 == 4, got(6L).toString)

      // the watermark only advances at batch BOUNDARIES (from the
      // previous batch's max event time), so push it past wave 1
      // with one orthogonal vector at 19:00 — its own micro-batch
      // commits watermark 18:00 and wave-1 state becomes evictable
      src.addData((999L, Seq(0.0, 0.0, 0.0, 1.0), Timestamp.valueOf("2026-01-01 19:00:00")))
      q.processAllAvailable()

      // wave 2: the SAME geometry 10 hours later with fresh ids. The
      // 1-hour watermark has passed wave 1 entirely, so state must
      // have aged out: identical verdicts (otherwise every wave-2
      // vector would be dropped as a dup of its wave-1 original) and
      // cluster-10 state holding only the pusher + the new row.
      got.clear()
      val w2 = wave.zipWithIndex.map { case ((id, v), i) =>
        (id + 100L, v, Timestamp.valueOf(f"2026-01-01 20:${i}%02d:00")) }
      src.addData(w2: _*); q.processAllAvailable()
      val expect2 = expect.map { case (k, v) => (k + 100L, v) }
      assert(got.view.filterKeys(_ > 100L).mapValues(_._2).toMap == expect2,
        got.toMap.toString)
      assert(got(101L)._3 <= 2, s"wave-2 cluster-10 state must be fresh: ${got(101L)}")
    } finally q.stop()
  }

  test("streaming ANN upsert: micro-batches fold exactly-once into frozen IVF artifacts") {
    val sfDir = "/root/testdata/sf0.01"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import graft.queries.AnnIndex
    import spark.implicits._
    // frozen base: the incremental artifact's base build (vec_id % 17
    // != 0) — the stream delivers the SAME arrival slice the batch
    // upsert folds, so corpus-coverage invariants carry over exactly
    val (cents, mp) = AnnIndex.ivfIncremental(spark, sfDir)
    val baseMembers = mp.head
    val root = java.nio.file.Files.createTempDirectory("ann-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ann-stream-ckpt").toString
    try {
      implicit val sqlCtx = spark.sqlContext
      val src = MemoryStream[(Long, Seq[Double])]
      val q = Streams.annUpsertVecs(
        src.toDF().toDF("vec_id", "v"), cents, root, ckpt)
      val chunks =
        try {
          val arrivals = AnnIndex.base(spark, sfDir)
            .filter(col("vec_id") % AnnIndex.IncMod === 0)
            .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
          val cs = arrivals.grouped((arrivals.length + 2) / 3).toSeq
          cs.foreach { c => src.addData(c.toSeq: _*); q.processAllAvailable() }
          cs
        } finally q.stop()
      // one committed arrivals directory per micro-batch; the grown
      // index covers the corpus exactly once
      val paths = AnnIndex.streamedMemberPaths(baseMembers, root)
      assert(paths.size == 1 + chunks.size, paths.toString)
      val n = AnnIndex.corpusSize(spark, sfDir)
      val grown = AnnIndex.readMembers(spark, paths)
      assert(grown.count() == n, "stream-grown members must cover the corpus once")
      assert(grown.select("vec_id").distinct().count() == n)
      // replay discipline: the sink SKIPS a committed batch directory
      // (never deletes what a reader may hold); even the uncommitted-
      // replay path — a forced rewrite of the same batch — converges
      // to the same content, never a second copy. The batch-0 dir is
      // checkpoint-token-namespaced, so it's resolved from the listing.
      val b0 = paths(1)
      assert(AnnIndex.committed(b0),
        "sink must have committed batch 0 (the replay guard's test)")
      AnnIndex.upsertIvf(spark, chunks.head.toSeq.toDF("vec_id", "v"),
        cents, b0)
      assert(AnnIndex.readMembers(spark,
        AnnIndex.streamedMemberPaths(baseMembers, root)).count() == n,
        "a replayed micro-batch must not double-index")
      // the stream-grown index is searchable at the audited recall,
      // by the same definition as the declared q_ann_upsert gate
      assert(graft.queries.VectorOps.ivfRecallOk(spark, sfDir, cents, paths),
        "stream-grown IVF recall fell below the 0.8 audit")
    } finally {
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(root))
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(ckpt))
    }
  }

  test("streaming ANN upsert: PQ micro-batches store committed-codebook codes, search-parity with in-plan encode") {
    val sfDir = "/root/testdata/sf0.01"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import graft.queries.{AnnIndex, VectorOps}
    import spark.implicits._
    val (cents, mp) = AnnIndex.ivfIncremental(spark, sfDir)
    val artifactRoot = AnnIndex.ivfIncPath(spark, sfDir)
    val cb = VectorOps.pqCodebook(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("pq-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pq-stream-ckpt").toString
    try {
      implicit val sqlCtx = spark.sqlContext
      val src = MemoryStream[(Long, Seq[Double])]
      val q = Streams.annUpsertPqVecs(
        src.toDF().toDF("vec_id", "v"), artifactRoot, cb, root, ckpt)
      val arrivals = AnnIndex.base(spark, sfDir)
        .filter(col("vec_id") % AnnIndex.IncMod === 0)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      try {
        arrivals.grouped((arrivals.length + 2) / 3).foreach { c =>
          src.addData(c.toSeq: _*); q.processAllAvailable()
        }
      } finally q.stop()
      // exactly-once coverage, and every streamed row carries its
      // STORED code (base members read back with pc = null)
      val paths = AnnIndex.streamedMemberPaths(mp.head, root)
      val grown = AnnIndex.readMembers(spark, paths)
      assert(grown.count() == AnnIndex.corpusSize(spark, sfDir),
        "stream-grown PQ members must cover the corpus once")
      assert(grown.filter(col("vec_id") % AnnIndex.IncMod === 0)
        .filter(col("pc").isNull).count() == 0,
        "every streamed arrival must carry its stored PQ code")
      // search parity: the streamed index (STORED codes) must return
      // exactly what the batch-upsert index (in-plan derived codes)
      // returns over the identical logical corpus — a stored code
      // that drifted from the kernel's in-plan encoding changes ADC
      // distances and breaks this equality
      def top(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val streamed = top(VectorOps.ivfPqTop5From(spark, sfDir, (cents, paths)))
      val batch = top(VectorOps.ivfPqUpsertTop5(spark, sfDir))
      assert(streamed == batch,
        s"stored-code search must equal in-plan-code search:\n$streamed\nvs\n$batch")
    } finally {
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(root))
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(ckpt))
    }
  }

  test("streaming ANN upsert: a post-re-train PQ batch lands in the new generation's coding") {
    import graft.queries.AnnIndex
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val rng = new scala.util.Random(11L)
    def vec(center: Double): Seq[Double] =
      Seq.tabulate(64)(i => center * math.sin(i * 0.37) + rng.nextGaussian() * 0.2)
    val dir = Files.createTempDirectory("pq-retrain").toString
    val ckpt1 = Files.createTempDirectory("pq-retrain-ck1").toString
    val ckpt2 = Files.createTempDirectory("pq-retrain-ck2").toString
    try {
      // dataset: 420 base vectors (ids 0..419 — includes the %31
      // codebook slice the PQ table derives from)
      (0L until 420L).map(id => (id, vec(1.0), 0))
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      AnnIndex.pruneArtifacts(dir)
      val (cents0, _) = AnnIndex.ivf(spark, dir)
      val root = AnnIndex.ivfPath(spark, dir)
      val cb = graft.queries.VectorOps.pqCodebook(spark, dir)
      implicit val sqlCtx = spark.sqlContext
      def streamIn(batch: Seq[(Long, Seq[Double])], ckpt: String): Unit = {
        val src = MemoryStream[(Long, Seq[Double])]
        val q = Streams.annUpsertPqVecs(
          src.toDF().toDF("vec_id", "v"), root, cb, root, ckpt)
        try { src.addData(batch: _*); q.processAllAvailable() } finally q.stop()
      }
      // stream a ~50% drift batch → stale → the verb re-trains and
      // swaps a NEW quantizer (k re-derived from the grown size)
      streamIn((420L until 620L).map(id => (id, vec(5.0))), ckpt1)
      assert(AnnIndex.retrainIvfIfStale(spark, root),
        "the drift batch must push growth past the re-train bound")
      val cents1 = AnnIndex.committedCents(spark, root)
      assert(cents1.length == AnnIndex.ivfK(620),
        "the new generation must carry the re-derived quantizer")
      // a batch streamed AFTER the swap must be assigned under the
      // NEW centroids — the sink re-reads committed centroids per
      // micro-batch, so no restart is needed
      val post = (620L until 660L).map(id => (id, vec(-2.0)))
      streamIn(post, ckpt2)
      val postDir = AnnIndex.streamedMemberPaths(s"$root/members", root)
        .filter(_.contains("arrivals-c")).last
      val gotCids = spark.read.parquet(postDir)
        .select(col("vec_id"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toMap
      val wantCids = AnnIndex.probeClusters(
        post.map { case (id, v) => (id, v.toArray) }, cents1, 1)
        .map { case (id, cid) => (id, cid) }.toMap
      assert(gotCids == wantCids,
        "a post-re-train streamed batch must be coded under the NEW quantizer")
    } finally {
      AnnIndex.pruneArtifacts(dir)
      graft.engine.Persist.deleteRecursively(Paths.get(dir))
      graft.engine.Persist.deleteRecursively(Paths.get(ckpt1))
      graft.engine.Persist.deleteRecursively(Paths.get(ckpt2))
    }
  }

  test("streaming ANN upsert: micro-batches fold exactly-once into frozen LSH artifacts, verb clears growth") {
    val sfDir = "/root/testdata/sf0.01"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    import graft.queries.AnnIndex
    import spark.implicits._
    val bits = AnnIndex.bitsFor(AnnIndex.corpusSize(spark, sfDir))
    val root = java.nio.file.Files.createTempDirectory("lsh-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lsh-stream-ckpt").toString
    try {
      // frozen base rows: the %17 != 0 slice hashed at the corpus
      // width — the same base/arrival split the batch fixture uses
      val base = AnnIndex.base(spark, sfDir)
      AnnIndex.upsertLsh(spark,
        base.filter(col("vec_id") % AnnIndex.IncMod =!= 0), bits, s"$root/rows")
      implicit val sqlCtx = spark.sqlContext
      val src = MemoryStream[(Long, Seq[Double])]
      val q = Streams.annUpsertLshVecs(
        src.toDF().toDF("vec_id", "v"), bits, root, ckpt)
      val chunks =
        try {
          val arrivals = base.filter(col("vec_id") % AnnIndex.IncMod === 0)
            .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
          val cs = arrivals.grouped((arrivals.length + 2) / 3).toSeq
          cs.foreach { c => src.addData(c.toSeq: _*); q.processAllAvailable() }
          cs
        } finally q.stop()
      // one committed arrivals directory per micro-batch; the grown
      // index holds one (vector, table) row per LIVE corpus vector
      val paths = s"$root/rows" +: AnnIndex.lshArrivalDirs(root)
      assert(paths.size == 1 + chunks.size, paths.toString)
      graft.functions.GraftFunctions.register(spark)
      val live = base.filter(expr("dot_product(v, v) > 0")).count()
      val grown = AnnIndex.readMembers(spark, paths)
      assert(grown.select("vec_id").distinct().count() == live)
      assert(grown.count() == live * AnnIndex.Tables,
        "stream-grown LSH rows must cover the live corpus exactly once per table")
      // the stream-grown index searches at the audited recall vs the
      // declared brute-force baseline (organic corpus) — computed
      // BEFORE the replay below rewrites arrivals-b0's part files
      // (the lazy frame holds the plan-time file listing)
      val brute = SparkEntry.queries("q_ann_brute")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val lsh = graft.queries.VectorOps
        .lshTop5From(spark, sfDir, grown, Some(bits)).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = brute.map { case (qid, bs) =>
        lsh.getOrElse(qid, Set.empty[Long]).intersect(bs).size.toDouble / bs.size
      }.sum / brute.size
      assert(recall >= 0.8, f"stream-grown LSH recall $recall%.3f < 0.8")
      // replay discipline: re-folding a committed batch converges to
      // the same content (overwrite-idempotent), never a second copy
      // (the batch-0 dir is checkpoint-token-namespaced — from listing)
      AnnIndex.upsertLsh(spark, chunks.head.toSeq.toDF("vec_id", "v"),
        bits, AnnIndex.lshArrivalDirs(root).head)
      assert(AnnIndex.readMembers(spark,
        s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
        .count() == live * AnnIndex.Tables,
        "a replayed micro-batch must not double-index")
      // NOTE: no !stale assertion here — the growth audit is BY BYTES
      // and deliberately overstates small arrivals (per-file parquet
      // overhead dominates a 500-vector fixture split across three
      // micro-batch directories; the documented err-early direction).
      // The bound's firing threshold is gated at data-bearing sizes by
      // the VectorOpsSpec retrain members; here the subject is the
      // stale→verb→cleared transition below.
      // stream a DRIFT batch past the 20% bound: growth flags stale,
      // and the maintenance verb (corpus re-hash) clears it — the
      // full streaming half of the r17 re-train discipline
      val rng = new scala.util.Random(13L)
      val drift = (0 until 400).map(i =>
        (1000000L + i, Seq.tabulate(64)(j => rng.nextGaussian())))
      val src2 = MemoryStream[(Long, Seq[Double])]
      val q2 = Streams.annUpsertLshVecs(
        src2.toDF().toDF("vec_id", "v"), bits, root,
        java.nio.file.Files.createTempDirectory("lsh-stream-ckpt2").toString)
      try { src2.addData(drift: _*); q2.processAllAvailable() } finally q2.stop()
      // the second query's batch ids restart at 0 — WITHOUT the
      // checkpoint-token namespace its only batch collided with the
      // first stream's committed arrivals-b0 and was silently dropped
      // (this assertion is what caught it): the drift must actually
      // be searchable before any staleness claim means anything
      assert(AnnIndex.readMembers(spark,
        s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
        .filter(col("vec_id") >= 1000000L)
        .select("vec_id").distinct().count() == drift.size,
        "a NEW stream on the same root must index its batches, not skip them")
      val (_, _, stale1) =
        AnnIndex.indexGrowth(spark, s"$root/rows", AnnIndex.lshArrivalDirs(root))
      assert(stale1, "a 20%+ streamed growth must flag stale")
      val grownCorpus = base.unionByName(drift.toDF("vec_id", "v"))
        .withColumnRenamed("v", "embedding")
      assert(AnnIndex.retrainLshIfStale(spark, root, grownCorpus,
        live + drift.size), "the verb must fire on a stale stream-grown root")
      val (_, _, stale2) =
        AnnIndex.indexGrowth(spark, s"$root/rows", AnnIndex.lshArrivalDirs(root))
      assert(!stale2, "the verb must clear staleness")
      assert(AnnIndex.readMembers(spark,
        s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
        .select("vec_id").distinct().count() == live + drift.size,
        "the retrained generation must hold base + streamed vectors once")
    } finally {
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(root))
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(ckpt))
    }
  }

  test("ann streaming: hashCode-colliding checkpoint paths keep distinct namespaces (md5 token)") {
    import graft.queries.AnnIndex
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("tok-stream").toString
    val parent = java.nio.file.Files.createTempDirectory("tok-ckpt")
    // "Aa"/"BB" collide under String.hashCode, and prefixing both with
    // the same parent preserves it (hash(s++t) = 31^|t|·hash(s) +
    // hash(t)) — exactly the collision class the r17 32-bit token was
    // vulnerable to
    val ckptA = parent.resolve("ck-Aa").toString
    val ckptB = parent.resolve("ck-BB").toString
    assert(ckptA.hashCode == ckptB.hashCode && ckptA != ckptB,
      "fixture premise: distinct paths colliding under 32-bit hashCode")
    try {
      val rng = new scala.util.Random(3L)
      def vecs(ids: Range): Seq[(Long, Seq[Double])] =
        ids.map(i => (i.toLong, Seq.fill(64)(rng.nextGaussian())))
      val bits = 8
      AnnIndex.upsertLsh(spark, vecs(0 until 20).toDF("vec_id", "v"),
        bits, s"$root/rows")
      def stream(ckpt: String, ids: Range): Unit = {
        val src = MemoryStream[(Long, Seq[Double])]
        val q = Streams.annUpsertLshVecs(
          src.toDF().toDF("vec_id", "v"), bits, root, ckpt)
        try { src.addData(vecs(ids): _*); q.processAllAvailable() }
        finally q.stop()
      }
      stream(ckptA, 100 until 110)
      stream(ckptB, 200 until 210)
      // both queries' batch ids start at 0 — under a colliding token
      // the second stream's only batch looks `committed` and is
      // silently skipped: acked by the stream, never searchable
      val ids = AnnIndex.readMembers(spark,
          s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
        .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
      assert((100L until 110L).forall(ids) && (200L until 210L).forall(ids),
        s"both colliding-checkpoint streams must stay searchable; got $ids")
    } finally {
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(root))
      graft.engine.Persist.deleteRecursively(parent)
    }
  }

  test("ann streaming: a batch committed under the legacy (pre-token) name is not re-indexed") {
    import graft.queries.AnnIndex
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("legacy-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("legacy-ckpt").toString
    try {
      val rng = new scala.util.Random(5L)
      def vecs(ids: Range): Seq[(Long, Seq[Double])] =
        ids.map(i => (i.toLong, Seq.fill(64)(rng.nextGaussian())))
      val bits = 8
      AnnIndex.upsertLsh(spark, vecs(0 until 20).toDF("vec_id", "v"),
        bits, s"$root/rows")
      // the upgrade-path replay (r17 ADVICE): a pre-token query
      // committed this batch as legacy arrivals-b0 (sink committed,
      // Spark's commit-log write crashed); the restarted query —
      // running post-upgrade, with the tokened namespace — replays
      // batch id 0 with the SAME data and must SKIP it, not index it
      // twice (readers union both namespaces). Since r19 the legacy
      // namespace is consulted only under a legacy ERA verdict, so
      // the fixture plants the pre-existing offsets log that marks
      // this checkpoint as predating tokens.
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(ckpt, "offsets"))
      val batch = vecs(100 until 110)
      AnnIndex.upsertLsh(spark, batch.toDF("vec_id", "v"),
        bits, s"$root/arrivals-b0")
      val src = MemoryStream[(Long, Seq[Double])]
      val q = Streams.annUpsertLshVecs(
        src.toDF().toDF("vec_id", "v"), bits, root, ckpt)
      try { src.addData(batch: _*); q.processAllAvailable() }
      finally q.stop()
      val grown = AnnIndex.readMembers(spark,
        s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
      assert(grown.filter(col("vec_id") >= 100L).count() ==
        10L * AnnIndex.Tables,
        "a legacy-committed batch replayed under the tokened namespace " +
          "must not double-index")
    } finally {
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(root))
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(ckpt))
    }
  }

  test("ann streaming: a batch committed under the r17 8-hex token is not re-indexed") {
    import graft.queries.AnnIndex
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("r17tok-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("r17tok-ckpt").toString
    try {
      val rng = new scala.util.Random(7L)
      def vecs(ids: Range): Seq[(Long, Seq[Double])] =
        ids.map(i => (i.toLong, Seq.fill(64)(rng.nextGaussian())))
      val bits = 8
      AnnIndex.upsertLsh(spark, vecs(0 until 20).toDF("vec_id", "v"),
        bits, s"$root/rows")
      // the r18 ADVICE upgrade gap: an R17-era query (32-bit hashCode
      // token) committed its in-flight batch, Spark's commit-log
      // write crashed, and the restart runs md5-token code — the
      // replay must find the r17-tokened directory committed and
      // skip, exactly as the pre-token case does. Era verdict:
      // pre-existing offsets log, no marker.
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(ckpt, "offsets"))
      val h = java.nio.file.Paths.get(ckpt)
        .toAbsolutePath.normalize.toString.hashCode
      val tok17 = f"${h & 0xffffffffL}%08x"
      val batch = vecs(300 until 310)
      AnnIndex.upsertLsh(spark, batch.toDF("vec_id", "v"),
        bits, s"$root/arrivals-c$tok17-b0")
      val src = MemoryStream[(Long, Seq[Double])]
      val q = Streams.annUpsertLshVecs(
        src.toDF().toDF("vec_id", "v"), bits, root, ckpt)
      try { src.addData(batch: _*); q.processAllAvailable() }
      finally q.stop()
      val grown = AnnIndex.readMembers(spark,
        s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
      assert(grown.filter(col("vec_id") >= 300L).count() ==
        10L * AnnIndex.Tables,
        "an r17-token-committed batch replayed under the md5 namespace " +
          "must not double-index")
    } finally {
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(root))
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(ckpt))
    }
  }

  test("ann streaming: a FRESH stream on a root carrying foreign legacy dirs indexes its batches") {
    import graft.queries.AnnIndex
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("fresh-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("fresh-ckpt").toString
    try {
      val rng = new scala.util.Random(9L)
      def vecs(ids: Range): Seq[(Long, Seq[Double])] =
        ids.map(i => (i.toLong, Seq.fill(64)(rng.nextGaussian())))
      val bits = 8
      AnnIndex.upsertLsh(spark, vecs(0 until 20).toDF("vec_id", "v"),
        bits, s"$root/rows")
      // the r18 ADVICE data-loss class: the root carries a DIFFERENT
      // (older) stream's pre-token arrivals-b0; a brand-new stream —
      // fresh checkpoint, no offsets log, different data — starts its
      // batch ids at 0. Unconditional legacy matching would skip its
      // batch 0 (acked, never searchable); the era verdict must keep
      // the legacy namespace out of a tokened-era stream's
      // committed-skip.
      AnnIndex.upsertLsh(spark, vecs(400 until 410).toDF("vec_id", "v"),
        bits, s"$root/arrivals-b0")
      val mine = vecs(500 until 510)
      val src = MemoryStream[(Long, Seq[Double])]
      val q = Streams.annUpsertLshVecs(
        src.toDF().toDF("vec_id", "v"), bits, root, ckpt)
      try { src.addData(mine: _*); q.processAllAvailable() }
      finally q.stop()
      val ids = AnnIndex.readMembers(spark,
          s"$root/rows" +: AnnIndex.lshArrivalDirs(root))
        .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
      assert((500L until 510L).forall(ids),
        s"a fresh stream's batch 0 must index despite a foreign legacy " +
          s"arrivals-b0 on the root; got $ids")
      assert((400L until 410L).forall(ids),
        "the foreign legacy directory must stay searchable")
    } finally {
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(root))
      graft.engine.Persist.deleteRecursively(java.nio.file.Paths.get(ckpt))
    }
  }

  test("cadence gate: trigger-bounded state and parity only — rate ratios are report-only") {
    def gate(nd: Double, aj: Double, p1b: Long = 100, p1: Long = 50,
             ajB: Long = 100, ajP: Long = 50, trig: Long = 5000,
             parity: Boolean = true): Boolean =
      StreamBench.cadenceGate(nd, aj, p1b, p1, ajB, ajP, trig, parity)
    assert(gate(1.3, 1.5))
    assert(gate(2.5, 3.0))
    // rate ratios must NOT gate: any margin sits inside the host's
    // measured ~4× same-code noise band, so a flat or even regressing
    // one-shot rate reading passes (the ratio is reported in the JSON
    // and adjudicated offline with isolated median-of-3 runs)
    assert(gate(1.05, 3.0), "within-jitter nd rate must not flip the verdict")
    assert(gate(3.0, 0.9), "a one-shot aj rate reading must not flip the verdict")
    // state peak bound: 3×small-trigger peak + 2×trigger
    assert(gate(2.0, 2.0, p1b = 3 * 50 + 2 * 5000))
    assert(!gate(2.0, 2.0, p1b = 3 * 50 + 2 * 5000 + 1),
      "stream-proportional state must fail the bound")
    // parity is a hard gate regardless of speedups
    assert(!gate(5.0, 5.0, parity = false))
  }
}
