package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery}

import graft.engine.Engine

/** Structured Streaming surface (SURVEY §7.2 step 6 — beyond the
  * reference, which has no streaming at all, SURVEY §2.6): continuous
  * ingest into the HTAP hot store, event-time windowed aggregation
  * with watermarks, and stateful sessionization.
  *
  * The batch-checkable analogues of the two analytics operators are
  * q_event_window and q_sessionize (same window/gap semantics, same
  * data) — the driver's DuckDB oracle gates those; the streaming
  * variants here are gated by StreamingSpec against in-memory sources.
  */
object Streams {

  /** Continuous ingest: each micro-batch lands through the engine's
    * batch write path — one store lock and one delta-log fsync per
    * batch (C8), not per row. Analytics over `engine.snapshot` see
    * streamed rows the moment their batch commits: the HTAP freshness
    * contract, fed by a stream.
    *
    * The per-batch collect is deliberate: the hot store lives in
    * driver memory by design (the reference's memtable is process
    * memory; SURVEY §3.1), and micro-batches are bounded by the
    * trigger interval. Rows whose PK already exists upsert, matching
    * INSERT semantics.
    *
    * Delivery contract: AT-LEAST-ONCE into an upserting store, which
    * makes the QUERYABLE STATE exactly-once. foreachBatch can replay
    * a micro-batch after a failure; a replayed batch re-puts the same
    * pks with NEW sequence numbers, so the LWW snapshot every reader
    * sees is unchanged (same keys, same values — idempotent), while
    * the internal version history carries the extra generations until
    * flush/compaction dedups them. Readers of the version LOG (not
    * the snapshot) must therefore not count versions as deliveries.
    * StreamingSpec's replay case gates the snapshot idempotence.
    */
  def ingest(engine: Engine, table: String, source: DataFrame): StreamingQuery = {
    val m = engine.meta(table).getOrElse(
      throw new IllegalArgumentException(s"Table '$table' does not exist"))
    val colNames = m.cols.map(_.name)
    source.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch.select(colNames.map(col): _*).collect()
          .map(r => Array.tabulate[Any](colNames.size)(r.get))
        if (rows.nonEmpty) engine.batchPut(table, rows.toSeq)
        ()
      }
      .start()
  }

  /** Event-time tumbling-window aggregation with a watermark: counts
    * and value sums per (window, event_type). Late rows beyond the
    * watermark are dropped; in append mode a window emits once, when
    * the watermark passes its end.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup over a document stream: fingerprint by
    * normalized-text md5 (the same normalization as the batch
    * q_fingerprint) and suppress duplicates WITHIN THE WATERMARK —
    * dropDuplicatesWithinWatermark keeps state bounded (expired
    * fingerprints age out), the only dedup that survives an unbounded
    * stream. A duplicate arriving later than the watermark horizon
    * passes through: that is the documented trade for bounded state;
    * the batch q_dedup_exact sweep catches stragglers downstream.
    */
  def dedupDocs(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", graft.queries.QualityRule.fpNormCol)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming curation funnel — the batch q_pipeline_curate shape on
    * a stream: map-only quality scoring (the SAME thresholds as the
    * batch quality frame: 10..2000 tokens, stop-word ratio ≤ 0.5)
    * followed by exact dedup within the watermark. Everything before
    * the dedup state is stateless per row, so the funnel's cost and
    * state bounds are exactly dedupDocs'.
    */
  def curateDocs(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    dedupDocs(
      docs
        .withColumn("toks", expr("filter(split(lower(text), '\\\\s+'), x -> x != '')"))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("stop_ratio",
          expr(s"size(filter(toks, x -> x IN (${graft.queries.QualityRule.stopListSql})))" +
            " / CAST(greatest(size(toks), 1) AS DOUBLE)"))
        .filter(expr(graft.queries.QualityRule.floorSql))
        .drop("toks", "n_tokens", "stop_ratio"),
      watermark)

  /** Stream-side n-gram decontamination — the batch q_decontam_bloom
    * shape moved to the INGEST path: a bloom filter over the static
    * eval set's word-8-gram hashes rides into every task as a
    * fixed-byte literal, and a streaming doc is dropped if ANY of its
    * 8-grams hits the filter. Entirely stateless map-side work (grams
    * are built inside the row with array ops — no shuffle, no state,
    * no watermark), so contamination never reaches the stored corpus
    * no matter how long the stream runs and state cost is ZERO.
    * Bloom guarantees transfer from the batch twin: a contaminated
    * doc is ALWAYS dropped (no false negatives); a clean doc is lost
    * only at the filter's fpp (~1e-6 at the sizing below). Hash
    * family matches the batch pipeline (xxhash64 over the
    * space-joined lowercase gram), so one filter serves both paths.
    */
  /** The ONE in-row word-8-gram xxhash64 expression (yields
    * `ARRAY<BIGINT>` from a `text` column) — the bloom's
    * no-false-negative guarantee holds only while the build side and
    * the probe side hash with the same family, so both use this
    * constant; a unilateral edit to either would silently break the
    * filter.
    */
  private val toksSql = """filter(split(lower(text), '\\s+'), x -> x != '')"""
  private val gram8HashSql = // over a `toks` column added via toksSql
    """CASE WHEN size(toks) >= 8 THEN
         transform(sequence(0, size(toks) - 8),
                   i -> xxhash64(concat_ws(' ', slice(toks, i + 1, 8))))
       ELSE CAST(array() AS ARRAY<BIGINT>) END"""

  def decontaminateDocs(docs: DataFrame, evalBloom: Array[Byte]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("toks", expr(toksSql))
      .withColumn("g8h", expr(gram8HashSql))
      .filter(!exists(col("g8h"),
        h => call_function("bloom_contains", lit(evalBloom), h)))
      .drop("toks", "g8h")
  }

  /** Stream-side quality-classifier application — the batch
    * q_quality_model shape moved to the INGEST path: the
    * hashed-linear score (md5-derived per-token weights, the
    * CCNet/fastText-style classifier stand-in; a trained weight
    * table is a broadcast map with the same plan) is computed
    * IN-ROW via transform + aggregate over the token array, so the
    * scorer is entirely stateless — no shuffle, no state, no
    * watermark, identical cost at any stream length. Docs the
    * classifier rejects (weight sum ≤ 0, the batch keep=0 rule)
    * drop before storage; survivors carry their score. Arithmetic
    * matches the batch query exactly (integer weight sum, one
    * double division), so stream and batch verdicts can never
    * disagree on the same row.
    */
  def classifyDocs(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(toksSql))
      .withColumn("sw", expr(
        """aggregate(toks, 0L, (a, t) ->
             a + CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % 2000001 - 1000000)"""))
      .filter(col("sw") > 0)
      .withColumn("score", expr("CAST(sw AS DOUBLE) / (1e6 * size(toks))"))
      .drop("toks", "sw")

  /** Windowed heavy-hitters over the token stream ("what's trending"):
    * the Misra–Gries sketch — functions.HeavyHittersAgg, the same
    * mergeable TypedImperativeAggregate behind batch
    * q_vocab_heavy_approx — running inside a watermarked event-time
    * window. The state store holds ONE ≤k-entry sketch buffer per
    * open window, never the vocabulary, so state is
    * O(k × open windows) at any stream length; and because the
    * sketch's three provable bounds (every token with tf > N/(k+1)
    * covered; estimates never above true counts; underestimate
    * ≤ N/(k+1)) hold under ANY merge order, the verdicts stay valid
    * under streaming's nondeterministic batch boundaries — the
    * property that lets StreamBench gate the stream output against
    * exact per-window counts. Append mode: each window emits once,
    * when the watermark passes its end.
    *
    * Output: one row per (window, surviving token) —
    * (win_start, n_toks, tok, est).
    */
  def trendingTokens(docs: DataFrame, k: Int = 200,
                     windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(expr(toksSql)).as("tok"))
      .groupBy(window(col("ts"), windowLen))
      .agg(expr(s"heavy_hitters(tok, $k)").as("hh"),
        count(lit(1)).as("n_toks"))
      .select(col("window.start").as("win_start"), col("n_toks"),
        explode(col("hh")).as("h"))
      .select(col("win_start"), col("n_toks"),
        col("h.tok").as("tok"), col("h.est").as("est"))
  }

  /** The once-per-benchmark eval-gram bloom [[decontaminateDocs]]
    * broadcasts: word-8-gram xxhash64s of `evalDocs`' text column
    * (same [[gram8HashSql]] family as the probe side), sized by the
    * shared batch rule [[graft.queries.QualityRule.bloomSizing]]
    * (29 bits/item ≈ 1e-6 fpp, inside Spark's runtime-filter caps).
    * The exploded hash frame is persisted so the count and the
    * aggregate run one tokenization, not two.
    */
  def evalGramBloom(spark: org.apache.spark.sql.SparkSession,
                    evalDocs: DataFrame): Array[Byte] = {
    graft.functions.GraftFunctions.register(spark)
    val hashes = evalDocs
      .withColumn("toks", expr(toksSql))
      .selectExpr(s"explode($gram8HashSql) AS h")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = hashes.count()
      require(n > 0, "eval corpus contributed no 8-grams")
      val (items, bits) = graft.queries.QualityRule.bloomSizing(n)
      hashes.agg(expr(s"bloom_agg(h, ${items}L, ${bits}L)"))
        .head.getAs[Array[Byte]](0)
    } finally hashes.unpersist(blocking = false)
  }

  /** Streaming NEAR-duplicate suppression: banded MinHash-LSH as a
    * chain of bounded-state dedups. The 16-slot minhash signature over
    * word-3-gram shingles is computed entirely INSIDE each row (array
    * transforms over the token list — map-only, no shuffle, no
    * stateful aggregation), grouped into 4 bands of 4 rows, and each
    * band key gets its own `dropDuplicatesWithinWatermark` stage.
    * Chaining the per-band dedups gives at-least-OR semantics: a doc
    * is suppressed if ANY band collides with a key already in that
    * stage's state — at least the batch q_dedup_minhash S-curve
    * (p ≥ 1-(1-J^4)^4), with per-band state that ages out at the
    * watermark like the exact-dedup path. The chain is TRANSITIVELY
    * suppressive: a doc dropped at stage k has already registered its
    * stage-0..k-1 band keys (it was their first occurrence), so a
    * later doc colliding with a DROPPED doc's early band is suppressed
    * too — the same transitivity dedup clustering embraces
    * (near-dup-of-a-near-dup is a dup), slightly more aggressive than
    * pure pairwise OR against kept docs. The spec's expected keep set
    * simulates exactly this chain over batch band keys. Unrelated
    * docs never share a band (4 independent 64-bit minima must all
    * agree), so false drops are vanishing.
    *
    * Shingle-less docs (< 3 tokens) band on the raw text hash —
    * i.e. exact-dedup fallback, never a shared NULL key.
    * Hash family derivation matches the batch pipeline: one base
    * xxhash64 per shingle, re-hashed with the family index.
    *
    * CADENCE (r21): per-row cost here is map-side and cheap, so at
    * small micro-batches the per-batch fixed cost (4 state-store
    * commits + planning) dominates wall-clock — measured 266 rows/s
    * at 500-row batches vs ~1,900 at 5000 on identical input. Deploy
    * with a trigger sized for thousands of rows per batch (or
    * Trigger.AvailableNow for backfill); StreamBench's headline arm
    * measures that shipped cadence, with the 500-row arm kept as the
    * explicit small-trigger experiment.
    */
  def nearDedupDocs(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    (0 until 4).foldLeft(bandKeys(docs).withWatermark("ts", watermark)) { (df, k) =>
      df.dropDuplicatesWithinWatermark(s"band$k")
    }.drop((0 until 4).map(k => s"band$k"): _*)   // internal keys, not payload

  /** The per-row banded-signature projection behind [[nearDedupDocs]]:
    * adds band0..band3 to `docs`. Works on batch frames too — which is
    * both how the spec derives its exact expected keep set and how a
    * backfill would compute the same keys the stream dedups on.
    */
  def bandKeys(docs: DataFrame): DataFrame = {
    val withSh = docs
      .withColumn("toks", expr("filter(split(lower(text), '\\\\s+'), x -> x != '')"))
      .withColumn("sh", expr(
        """CASE WHEN size(toks) >= 3 THEN
             transform(sequence(0, size(toks) - 3),
                       i -> xxhash64(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
           ELSE array(xxhash64(text)) END"""))
    val sigs = (0 until 16).map(j =>
      expr(s"array_min(transform(sh, h -> xxhash64(h, $j)))").as(s"s$j"))
    (0 until 4).foldLeft(withSh.select(col("*") +: sigs: _*)) { (df, k) =>
      df.withColumn(s"band$k", xxhash64(
        col(s"s${4 * k}"), col(s"s${4 * k + 1}"),
        col(s"s${4 * k + 2}"), col(s"s${4 * k + 3}")))
    }.drop("toks", "sh").drop((0 until 16).map(j => s"s$j"): _*)
  }

  /** Stream-side weighted-mixture construction — the batch
    * q_mix_weighted fan-out on the INGEST path, via the SAME shared
    * resolver (TextOps.mixCopies), so stream and batch emit
    * identical copy sets for identical rows. Stateless map-side
    * explode: no shuffle, no state, no watermark — a doc's copy
    * count is a pure function of its key, independent of stream
    * position or batch boundaries.
    */
  def mixDocs(docs: DataFrame): DataFrame =
    graft.queries.TextOps.mixCopies(docs)

  /** Stream-STREAM interval join — the attribution shape (view →
    * conversion within a horizon), the one streaming join whose state
    * Spark can bound from the predicate alone: both sides carry
    * watermarks and the join condition brackets `buy_ts` into
    * [view_ts, view_ts + horizon], so each side's state store evicts
    * rows as soon as the other side's watermark passes their
    * reachable window — state is O(rate x (watermark + horizon)),
    * never O(stream). Inner join, append mode: a pair emits in the
    * micro-batch where its second half arrives; a conversion with no
    * view inside the horizon never emits.
    *
    * The batch analogue on the same `events` table is q_funnel /
    * q_asof_join (same user-bracketed event-time semantics);
    * StreamingSpec derives the exact expected pair set from a batch
    * join over the identical rows and pins cross-batch arrival.
    */
  def attributeConversions(views: DataFrame, conversions: DataFrame,
                           horizonMin: Int = 30,
                           watermark: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val c = conversions
      .select(col("user_id").as("c_user"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"), col("value"))
      .withWatermark("conv_ts", watermark)
    v.join(c, expr(
        s"""v_user = c_user
            AND conv_ts >= view_ts
            AND conv_ts <= view_ts + interval $horizonMin minutes"""))
      .select(col("v_user").as("user_id"), col("view_id"), col("conv_id"),
        col("view_ts"), col("conv_ts"), col("value"))
  }

  case class Evt(user_id: Long, ts: java.sql.Timestamp)
  case class SemIn(vec_id: Long, cid: Long, v: Seq[Double], ts: java.sql.Timestamp)
  case class SemState(rows: Vector[(Long, Seq[Double], Long)])
  case class SemOut(vec_id: Long, cid: Long, keep: Int, state_rows: Int)

  /** Streaming SemDeDup member (the batch q_dedup_semantic on the
    * ingest path): assignment is STATELESS — the same fused
    * cosine_argmax projection against a literal codebook the batch
    * runs (the codebook is a parameter, so a capped or sampled
    * codebook — the fix for the batch query's n/53 driver-codebook
    * growth note — is just what the caller passes) — and the
    * within-cluster prune is per-cluster keep-state: every arriving
    * vector compares against the cluster's vectors still inside the
    * watermark, emits keep=0 iff any matches at `minCosine`, and
    * registers itself either way (the batch rule drops b against ANY
    * earlier a, kept or dropped — transitive chains behave
    * identically). For a stream arriving in vec_id order the emitted
    * verdicts EQUAL the batch query's on the same rows (StreamingSpec
    * gates this exactly; within one micro-batch the group's rows are
    * sorted by vec_id so batch boundaries cannot reorder).
    *
    * State discipline (the trendingTokens/sessionize treatment):
    * rows older than the current watermark are evicted on every
    * group invocation, and the group times out (removing the whole
    * cluster's state) once the watermark passes its newest row — so
    * state is O(rate × watermark) per cluster, never
    * O(stream). Each output row carries `state_rows` (the cluster's
    * state size after the row registered), the observable StreamBench
    * gates the rate bound on — no store-internals introspection
    * needed.
    *
    * Input `vecs`: (vec_id, v: array<double>, ts) with zero-norm rows
    * already excluded (cosine undefined — the batch live-set rule).
    */
  def semanticDedupVecs(vecs: DataFrame, codebook: Seq[(Long, Seq[Double])],
                        minCosine: Double,
                        watermark: String = "1 hour"): Dataset[SemOut] = {
    import vecs.sparkSession.implicits._
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    require(codebook.nonEmpty, "semanticDedupVecs: empty codebook")
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    vecs
      .withWatermark("ts", watermark)
      .withColumn("cid",
        call_function("cosine_argmax", col("v"), typedLit(codebook)))
      .select(col("vec_id"), col("cid"), col("v"), col("ts"))
      .as[SemIn]
      .groupByKey(_.cid)
      .flatMapGroupsWithState[SemState, SemOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (cid, it, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            var rows = state.getOption.map(_.rows).getOrElse(Vector.empty)
              .filter(_._3 >= wm)
            val out = Vector.newBuilder[SemOut]
            it.toVector.sortBy(_.vec_id).foreach { r =>
              val dup = rows.exists { case (_, v0, _) => cos(v0, r.v) >= minCosine }
              rows :+= ((r.vec_id, r.v, r.ts.getTime))
              out += SemOut(r.vec_id, cid, if (dup) 0 else 1, rows.size)
            }
            state.update(SemState(rows))
            val maxTs = rows.map(_._3).max
            state.setTimeoutTimestamp(math.max(maxTs, wm) + 1000L)
            out.result().iterator
          }
      }
  }

  /** Streaming ANN index maintenance: fold a vector stream into
    * FROZEN IVF artifacts — each micro-batch is assigned to the
    * frozen centroids (broadcast codebook over the BATCH, never a
    * corpus re-scan) and committed as its OWN batchId-named arrivals
    * directory under `root`.
    *
    * Delivery contract: EXACTLY-ONCE BY CONSTRUCTION — under a
    * DURABLE checkpoint, which is why `checkpoint` is a required
    * parameter and not a Spark default: only a persisted offset log
    * makes a restarted query resume at the SAME batch id. Directory
    * names carry a checkpoint-derived token (see [[ckptToken]]), so a
    * NEW query later started on the same root — whose batch ids
    * restart at 0 — lands in its own namespace instead of colliding
    * with (and being silently skipped against) an earlier query's
    * committed directories. A replayed id whose
    * directory already COMMITTED is skipped outright — the batch
    * data is identical by the replay contract, and never deleting a
    * committed directory means a reader that captured the path list
    * moments earlier can never race a replay into a missing or
    * half-rewritten root. A replayed id whose write never committed
    * (no `_SUCCESS`) overwrites the partial directory — readers
    * never saw it. Readers resolve the grown index via
    * AnnIndex.streamedMemberPaths (base members + every arrivals
    * directory whose `_SUCCESS` committed).
    *
    * Input `vecs`: (vec_id, v: array<double>); vec_ids must be new to
    * the index (LWW belongs to the engine tier, not the index — the
    * batch-path rule). Staleness of the frozen quantizer is the same
    * audited contract as the batch upsert (recall gate, re-train past
    * ~20% growth).
    */
  /** Stable per-QUERY token for arrivals-directory names, derived
    * from the checkpoint path: a RESTART of the same query reuses its
    * checkpoint, so replayed batch ids map to the same directory and
    * the committed-skip gives exactly-once; a NEW query on the same
    * index root necessarily has a new checkpoint, so its batch ids —
    * which restart at 0 — can never collide with an earlier query's
    * committed directories. Without the token, a second ingest stream
    * started later on the same root silently DROPPED every batch
    * whose id matched an old committed dir: acked by the stream,
    * never searchable.
    */
  private def ckptToken(checkpoint: String): String = {
    // md5-derived, 64 bits (r17 ADVICE): the previous 32-bit
    // String.hashCode made two distinct checkpoints colliding a
    // birthday-bounded-but-real event across many streams, and a
    // collision silently re-introduces the dropped-batch bug this
    // token exists to prevent (the second stream's batches look
    // `committed` and are skipped). 16 hex chars of the repo's
    // standard md5 pushes the birthday bound past any plausible
    // stream count while keeping directory names short.
    val norm = java.nio.file.Paths.get(checkpoint)
      .toAbsolutePath.normalize.toString
    java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  /** The r17-era 32-bit token of this checkpoint — the name a batch
    * committed under BEFORE the md5 token (r18) replaced it. A query
    * restarted from an r17 checkpoint replays its in-flight batch
    * under the md5 token, so the committed-skip must also consult
    * this namespace (r18 ADVICE) or the batch indexes twice.
    */
  private def ckptTokenR17(checkpoint: String): String = {
    val h = java.nio.file.Paths.get(checkpoint)
      .toAbsolutePath.normalize.toString.hashCode
    f"${h & 0xffffffffL}%08x"
  }

  /** Era verdict for a checkpoint, decided ONCE at first sink start
    * and persisted as a marker file inside the checkpoint directory
    * (atomic tmp+move): "legacy" iff the checkpoint already carried
    * an offsets log before any marker existed — i.e. the query ran
    * under pre-r18 code — else "tokened". The committed-skip consults
    * the legacy namespaces (pre-token `arrivals-b<id>`, r17 8-hex
    * token) ONLY under a legacy verdict: a BRAND-NEW stream attached
    * to a root carrying another stream's legacy directories would
    * otherwise silently skip its own batches 0..k (r18 ADVICE — the
    * acked-but-never-searchable data-loss class the token exists to
    * prevent). Recording the verdict rather than re-deriving it keeps
    * it stable across restarts: by the time a tokened query restarts
    * it HAS an offsets log, which would otherwise flip it legacy.
    */
  private[graft] def ckptEraLegacy(checkpoint: String): Boolean = {
    val ckpt = java.nio.file.Paths.get(checkpoint).toAbsolutePath.normalize
    val marker = ckpt.resolve("graft-token-era")
    if (java.nio.file.Files.isRegularFile(marker))
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8).trim == "legacy"
    else {
      val legacy = java.nio.file.Files.isDirectory(ckpt.resolve("offsets"))
      java.nio.file.Files.createDirectories(ckpt)
      val tmp = ckpt.resolve("graft-token-era.tmp")
      java.nio.file.Files.write(tmp,
        (if (legacy) "legacy" else "tokened")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      try java.nio.file.Files.move(tmp, marker,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { // lost a concurrent-start race: the winner's verdict holds
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.FileSystemException =>
          java.nio.file.Files.deleteIfExists(tmp); ()
      }
      legacy
    }
  }

  /** The committed-skip test for one streamed micro-batch: the
    * tokened directory always; under a legacy era verdict (see
    * [[ckptEraLegacy]]) also the pre-token `arrivals-b<id>` name
    * (r17 ADVICE upgrade-path gap) and the r17 8-hex-token name
    * (r18 ADVICE) — a query restarted from a pre-md5-token
    * checkpoint replays its in-flight batch under the new tokened
    * name, and a directory already committed under either older
    * name would otherwise be indexed twice (readers union all
    * arrivals namespaces).
    */
  private def batchCommitted(root: String, tok: String,
                             legacyTok: Option[String], id: Long): Boolean =
    graft.queries.AnnIndex.committed(s"$root/arrivals-c$tok-b$id") ||
      legacyTok.exists(lt =>
        graft.queries.AnnIndex.committed(s"$root/arrivals-c$lt-b$id") ||
          graft.queries.AnnIndex.committed(s"$root/arrivals-b$id"))

  /** legacyTok parameter for [[batchCommitted]]: the r17 token when
    * this checkpoint's era verdict is legacy, else None (legacy
    * namespaces not consulted).
    */
  private def legacyTokOf(checkpoint: String): Option[String] =
    if (ckptEraLegacy(checkpoint)) Some(ckptTokenR17(checkpoint)) else None

  def annUpsertVecs(vecs: DataFrame, cents: Array[Array[Double]],
                    root: String, checkpoint: String): StreamingQuery = {
    val tok = ckptToken(checkpoint)
    val legacyTok = legacyTokOf(checkpoint)
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batchCommitted(root, tok, legacyTok, id))
          graft.queries.AnnIndex.upsertIvf(
            batch.sparkSession, batch.toDF(), cents, s"$root/arrivals-c$tok-b$id")
        ()
      }
      .start()
  }

  /** LSH sibling of [[annUpsertVecs]] (r17 — the streaming half of the
    * index-maintenance symmetry): each micro-batch hashes through the
    * FIXED seeded planes at the artifact's committed bit width into
    * its own batchId-named arrivals directory, under the identical
    * exactly-once replay contract (durable checkpoint; a committed
    * directory is skipped outright, an uncommitted one is
    * overwritten). Plane determinism guarantees the arrival rows
    * equal what a full rebuild at that width would emit. Readers
    * resolve the grown index via `rows` + AnnIndex.lshArrivalDirs;
    * growth past AnnIndex.RetrainGrowth flags `stale`, cleared by the
    * retrainLshIfStale maintenance verb with the grown corpus (the
    * LSH artifact stores ids, never vectors — the verb re-hashes).
    *
    * `bits` should come from AnnIndex.lshBitsOf(root, default): after
    * a mechanized re-train the artifact's width diverges from the
    * dataset derivation, and a batch hashed at the stale width would
    * land in buckets no probe visits.
    */
  def annUpsertLshVecs(vecs: DataFrame, bits: Int, root: String,
                       checkpoint: String): StreamingQuery = {
    val tok = ckptToken(checkpoint)
    val legacyTok = legacyTokOf(checkpoint)
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batchCommitted(root, tok, legacyTok, id))
          graft.queries.AnnIndex.upsertLsh(
            batch.sparkSession, batch.toDF(), bits, s"$root/arrivals-c$tok-b$id")
        ()
      }
      .start()
  }

  /** IVF-PQ sibling of [[annUpsertVecs]] (r18 — closes the last
    * index-maintenance asymmetry: IVF and LSH streamed, PQ did not,
    * so a PQ index under continuous ingest silently served a
    * shrinking fraction of its corpus): each micro-batch is assigned
    * to the artifact's COMMITTED centroids and committed WITH its
    * stored PQ codes (AnnIndex.upsertIvfPq — encoded against the
    * frozen codebook `cb` by the same deterministic kernel the search
    * path derives in-plan) into a checkpoint-token-namespaced
    * arrivals directory, under the identical exactly-once replay
    * contract as the other two sinks.
    *
    * Re-train riding: the coarse centroids are RE-READ from the
    * artifact per micro-batch (AnnIndex.committedCents — a K×64
    * model-sized read), so a batch arriving after retrainIvfIfStale
    * swapped generations is assigned under the NEW quantizer — the
    * re-encode-on-codebook-change contract without a sink restart.
    * (A frozen cents parameter — the annUpsertVecs shape — would
    * assign post-re-train arrivals to centroids no probe consults.)
    * The PQ codebook `cb` stays a parameter: its slice is frozen by
    * contract (pqCodebook's scaladoc — arrivals never retrain it),
    * and a re-trained generation drops stored codes anyway (members
    * carry vec_id, v), falling back to in-plan encoding.
    */
  def annUpsertPqVecs(vecs: DataFrame, artifactRoot: String,
                      cb: Seq[(Long, Seq[Int])], root: String,
                      checkpoint: String): StreamingQuery = {
    val tok = ckptToken(checkpoint)
    val legacyTok = legacyTokOf(checkpoint)
    vecs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batchCommitted(root, tok, legacyTok, id)) {
          val cents = graft.queries.AnnIndex
            .committedCents(batch.sparkSession, artifactRoot)
          graft.queries.AnnIndex.upsertIvfPq(
            batch.sparkSession, batch.toDF(), cents, cb,
            s"$root/arrivals-c$tok-b$id")
        }
        ()
      }
      .start()
  }

  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionOut(user_id: Long, startMs: Long, endMs: Long, nEvents: Int)

  /** Stateful sessionization via flatMapGroupsWithState: sessions
    * close after `gapMs` of inactivity, tracked per user with
    * event-time timeouts — a session also closes when the watermark
    * passes its gap even if the user never returns. The batch
    * analogue (same 30-minute gap) is q_sessionize.
    */
  def sessionize(events: Dataset[Evt], gapMs: Long = 30 * 60 * 1000L,
                 watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.start, s.last, s.n))
          } else {
            val evts = it.toVector.sortBy(_.ts.getTime)
            var closed = Vector.empty[SessionOut]
            var cur = state.getOption
            evts.foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t - s.last > gapMs =>
                  closed :+= SessionOut(uid, s.start, s.last, s.n)
                  Some(SessionState(t, t, 1))
                case Some(s) =>
                  Some(SessionState(s.start, math.max(s.last, t), s.n + 1))
                case None =>
                  Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.iterator
          }
      }
  }
}
