package graft.queries

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline text operators over `documents`
  * (doc_id, text, lang, source, n_chars): exact dedup, document
  * fingerprinting, token counting, quality scoring, language ID, and
  * near-duplicate detection (exact n-gram Jaccard via inverted index;
  * MinHash-LSH and SimHash as the sub-quadratic scale paths).
  *
  * Everything is built from codegen'd builtin functions (split /
  * transform / filter / aggregate / xxhash64) — no UDFs — so the hot
  * path stays inside whole-stage codegen.
  *
  * Scale design: the exact-Jaccard candidate generator is an
  * inverted-index self-join on shingles (shuffle by shingle, then
  * group-count per pair) — the co-count IS the intersection size, so
  * no per-pair array intersection is ever materialized. At 100 TB a
  * frequency cutoff on hot shingles (stop-shingles) bounds skew; the
  * MinHash-LSH variant replaces the exact index when even that is too
  * large.
  */
object TextOps {

  /** Planted unicode variants for q_text_unicode_norm, indexed by
    * doc_id % 8: decomposed combining-mark forms (NFC composes),
    * their precomposed twins (NFC no-ops), NFC-invariant ligatures
    * (NFKC-only folds — the spec-side contrast case), and a plain
    * row. BMP-only, so code-point length agrees across engines.
    */
  private[graft] val unicodeVariants: Seq[String] = Vector(
    "Café du Monde",            // e + U+0301 -> é
    "Ångström units",     // A+ring, o+diaeresis -> Å ö
    "Ångström units",       // precomposed twin (no-op)
    "naïve résumé",    // precomposed (no-op)
    "maître d'hôtel",     // i/o + U+0302 -> î ô
    "ﬁnal ﬂight",           // fi/fl ligatures: NFC keeps
    "Tür öffnen",         // u/o + U+0308 -> ü ö
    "plain ascii row")

  /** One row per (doc_id, distinct word-3-gram shingle).
    *
    * Plan shape matters here, twice:
    *  - the explicit-count repartition spreads the (locally
    *    single-file) scan across cores before the per-doc shingle
    *    transform — at 100 TB file parallelism provides this
    *    naturally, and the shuffle is proportional to the text, not
    *    the shingles; the explicit count keeps AQE from coalescing
    *    the tiny-by-bytes but CPU-heavy stage back to one partition;
    *  - the persist() between the array computation and the explode
    *    is a hard plan barrier: Catalyst inlines a computed array
    *    into Generate and re-evaluates it per OUTPUT row, turning the
    *    O(tokens) transform into O(tokens²) — measured 10.7 s vs
    *    0.23 s at sf0.1 for the same explode. A repartition between
    *    them does NOT survive the optimizer (adjacent repartitions
    *    collapse); the cache boundary does. The cached frame is one
    *    small array row per document, spill-safe (MEMORY_AND_DISK).
    *
    * Everything downstream of the explode is plain columns — hashing
    * and aggregation stay inside whole-stage codegen (higher-order
    * array lambdas are interpreted; per-element work in them is the
    * slow path).
    */
  /** (doc_id, text, toks) with the split tokenization persisted — one
    * cache shared by every consumer (shingles, winnowing, quality,
    * lang-id): the persist is ALSO the plan barrier that keeps
    * Generate from re-evaluating the computed array per exploded row
    * (see shingleRows scaladoc) AND the barrier that keeps
    * CollapseProject from inlining the split into each of quality's 4
    * sibling consumers (tokenization would run 4× per row,
    * interpreted). The cache is columnar, so consumers that never
    * touch `text` (shingles) prune it at the InMemoryTableScan.
    *
    * Caches are query-scoped: Bench/Verify clearCache() between
    * queries; embedding callers should do the same.
    */
  /** Shared-frame memo, keyed per (session, dataset, variant): repeat
    * queries reuse ONE persisted frame instead of re-registering an
    * identical plan per call (CacheManager dedups those, but each
    * registration logs an already-cached warning and leaks a plan
    * reference). A memoized frame whose blocks were dropped by
    * `spark.catalog.clearCache()` (Bench/Verify do this between
    * queries) is detected via `storageLevel` and rebuilt — reusing it
    * uncached would silently lose the persist plan barrier that keeps
    * Generate from re-evaluating computed arrays per output row.
    */
  private val frameMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  private def memoized(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (System.identityHashCode(s), key)
    frameMemo.get(k) match {
      case Some(df) if df.storageLevel != org.apache.spark.storage.StorageLevel.NONE => df
      case _ =>
        val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        frameMemo.put(k, df)
        df
    }
  }

  /** Unpersist every memoized frame (long-lived drivers embedding
    * these pipelines call this after a batch; Bench/Verify use
    * clearCache, which the memo also detects).
    */
  def releaseCaches(): Unit = {
    frameMemo.values.foreach(_.unpersist(blocking = false))
    frameMemo.clear()
    // scalar memos too: a long-lived driver that rewrites data at the
    // same path would otherwise score with a stale vocabulary size /
    // doc count after releasing the frames
    nDocsMemo.clear()
    vocabMemo.clear()
    corpusTokMemo.clear()
  }

  /** Document count per dataset — parquet-metadata cheap, memoized;
    * drives the corpus-derived stop-shingle cutoff.
    */
  private val nDocsMemo = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def nDocs(s: SparkSession, d: String): Long =
    nDocsMemo.getOrElseUpdate(d, t(s, d, "documents").count())

  /** (docbg, model) — the add-one-smoothed bigram LM shared by
    * q_lm_train (emits the model) and q_lm_perplexity (scores with
    * it). ONE corpus-wide window pass: docbg (per-doc bigram types)
    * is memoized, and the model's global counts re-aggregate IT —
    * bgc = Σ_doc dc over (w1,w2), ctx = Σ c12 over w1 — instead of
    * re-running the posexplode+lead pipeline per count table. The
    * memo also keeps the scoring join's probe side from re-deriving
    * the window output. Each bigram type's ln-prob rounds ONCE to
    * integer micro-nats (the cross-engine float discipline).
    */
  private def lmModelFrames(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val v = vocabSize(s, d)
    val docbg = memoized(s, s"lmdocbg:$d") {
      bigramRows(s, d)
        .groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("dc"))
    }
    val bgc = docbg.groupBy(col("w1"), col("w2"))
      .agg(sum(col("dc")).cast("bigint").as("c12"))
    val ctx = bgc.groupBy(col("w1")).agg(sum(col("c12")).cast("bigint").as("c1"))
    val model = bgc.join(ctx, Seq("w1"))
      .selectExpr("w1", "w2", "c12", "c1",
        s"CAST(round(ln((c12 + 1.0) / (c1 + ${v}L)) * 1000000) AS BIGINT) AS micro")
    (docbg, model)
  }

  /** DuckDB twin of [[lmModelFrames]] — CTEs ending in
    * `docbg(doc_id, w1, w2, dc)` and `model(w1, w2, c12, c1, micro)`,
    * shared by the q_lm_train and q_lm_perplexity oracles.
    */
  private val lmModelCteSql: String =
    """toksrc AS (SELECT doc_id,
            list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
          FROM documents),
       bg AS (SELECT doc_id,
                unnest([toks[i] for i in range(1, len(toks))]) AS w1,
                unnest([toks[i+1] for i in range(1, len(toks))]) AS w2
              FROM toksrc),
       v AS (SELECT count(DISTINCT tok) AS v
             FROM (SELECT unnest(toks) AS tok FROM toksrc)),
       docbg AS (SELECT doc_id, w1, w2, count(*) AS dc FROM bg GROUP BY doc_id, w1, w2),
       bgc AS (SELECT w1, w2, CAST(sum(dc) AS BIGINT) AS c12 FROM docbg GROUP BY w1, w2),
       ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bgc GROUP BY w1),
       model AS (SELECT bgc.w1, bgc.w2, bgc.c12, ctx.c1,
                   CAST(round(ln((bgc.c12 + 1.0) / (ctx.c1 + v.v)) * 1000000) AS BIGINT) AS micro
                 FROM bgc JOIN ctx ON bgc.w1 = ctx.w1 CROSS JOIN v)"""

  /** Corpus token total per dataset (BM25's avgdl denominator) — one
    * aggregate over the memoized toks frame, memoized like nDocs so
    * repeat invocations skip the driver job.
    */
  private val corpusTokMemo = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def corpusTokens(s: SparkSession, d: String): Long =
    corpusTokMemo.getOrElseUpdate(d,
      toksFrame(s, d).agg(sum(size(col("toks"))).cast("bigint")).first().getLong(0))

  /** Stop-shingle document-frequency cutoff, derived from corpus size
    * (the same treatment as `AnnIndex.bitsFor`): a fixed cutoff drops
    * an ever-larger shingle fraction as the corpus grows — df > n/1000
    * keeps "stop" meaning "in a constant fraction of documents" at any
    * scale, floored at 100 so small corpora keep today's behavior.
    * CAPPED at 100k (r20, r19 verdict item 5): the anchor co-count
    * route holds one O(maxDf) posting array per hot-shingle row, so
    * an uncapped n/1000 makes row size corpus-proportional — at 10B
    * docs a 10M-element array (~80 MB) per row, an executor-memory
    * hazard. The cap bounds every posting row at ≤ 100k longs
    * (~800 KB — comfortably inside any executor's row budget) and
    * bounds per-anchor pair emission at O(100k); shingles between the
    * cap and n/1000 are simply treated as stop-shingles, which only
    * STRENGTHENS the stop semantics on ultra-hot shingles. The cap
    * engages at n > 100M docs — far above every test scale, inert for
    * the oracles, which mirror the identical formula.
    */
  private[graft] def maxDfFor(n: Long): Long =
    math.min(100000L, math.max(100L, n / 1000L))

  private def toksFrame(s: SparkSession, d: String,
                        withText: Boolean = false): DataFrame =
    memoized(s, s"toks:$d:$withText") {
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val cols = (if (withText) Seq("doc_id", "text") else Seq("doc_id")) :+
        "filter(split(lower(text), '\\\\s+'), x -> x != '') AS toks"
      t(s, d, "documents")
        .repartition(parts, col("doc_id"))
        .selectExpr(cols: _*)
    }

  /** (doc_id, sw, n) — the hashed-linear quality-classifier aggregate
    * (sum of md5-derived integer token weights + token count), shared
    * by q_quality_model and the rank-ensemble queries
    * (q_global_rank / q_rank_fusion) so score and ranks cannot drift.
    * Exact integers; the double score derives at the consumer.
    */
  private def qmodelAgg(s: SparkSession, d: String): DataFrame =
    memoized(s, s"qmodelAgg:$d") {
      toksFrame(s, d)
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .selectExpr("doc_id",
          "CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT) % 2000001 - 1000000 AS wi")
        .groupBy(col("doc_id"))
        .agg(sum(col("wi")).cast("bigint").as("sw"), count(lit(1)).as("n"))
    }

  /** DuckDB twin of [[qmodelAgg]] — `qm(doc_id, sw, n)`, shared by the
    * same three oracles.
    */
  private val qmodelCteSql: String =
    """t AS (SELECT doc_id,
                unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS tok
              FROM documents),
        w AS (SELECT doc_id,
                ('0x' || substr(md5(tok), 1, 15))::BIGINT % 2000001 - 1000000 AS wi
              FROM t),
        qm AS (SELECT doc_id, CAST(sum(wi) AS BIGINT) AS sw, count(*) AS n
               FROM w GROUP BY doc_id)"""

  /** (doc_id, pos, g) word-n-gram rows — ONE gram builder for every
    * n-gram consumer (3-gram shingles, winnowing 5-grams, 8-gram
    * decontamination): exploded tokens + lead() windows, so the gram
    * concat runs codegen'd, never as interpreted array lambdas. One
    * row per gram START; docs shorter than n tokens contribute
    * nothing (the trailing lead is NULL). Keeping a single tokenizer/
    * window shape here is what keeps all gram pipelines in lockstep
    * with the oracle CTEs.
    */
  private def gramRows(s: SparkSession, d: String, n: Int): DataFrame = {
    val wLead = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toksFrame(s, d)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"),
        lead(col("tok"), n - 1).over(wLead).as("tlast"),
        concat_ws(" ",
          col("tok") +: (1 until n).map(i => lead(col("tok"), i).over(wLead)): _*).as("g"))
      .filter(col("tlast").isNotNull)
      .select(col("doc_id"), col("pos"), col("g"))
  }

  /** (doc_id, w1, w2) word-bigram rows — the n=2 sibling of gramRows
    * kept as separate columns (the LM scorer joins on the left word
    * alone for context counts, so the concat form would force a
    * re-split). Same tokenizer, same lead-window shape.
    */
  private def bigramRows(s: SparkSession, d: String): DataFrame = {
    val wLead = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toksFrame(s, d)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("tok").as("w1"),
        lead(col("tok"), 1).over(wLead).as("w2"))
      .filter(col("w2").isNotNull)
  }

  /** Number of BPE training rounds for q_bpe_train — fixed so the
    * vocabulary evolution is a deterministic oracle target.
    */
  private[graft] val bpeTrainRounds = 6

  /** One BPE round's pair table over a (doc_id, toks) frame:
    * (doc_id, pos, tok, nxt) adjacency rows. Window-shaped like
    * bigramRows but over an ARBITRARY token frame (the trainer
    * re-tokenizes between rounds, so it cannot use the memoized
    * corpus frame past round 1).
    */
  private def bpeAdj(cur: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    cur.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(wd))
  }

  /** Apply a BATCH of token-disjoint merges in ONE window pass with
    * the GREEDY left-to-right non-overlap rule, entirely in windows
    * over the by-doc partition — no joins, no interpreted per-token
    * fold: hit positions group into runs via a running non-hit count,
    * a run takes its even offsets (floor(L/2) for the w1=w2 runs —
    * the q_bpe_merge_step rule), taken positions emit the merged
    * token (space-joined, distinguishable since corpus tokens never
    * contain spaces) and their consumed successors drop. The
    * m=1 case is exactly the single-pair rule. Disjointness (no token
    * appears in two pairs, guaranteed by [[bpeSelectTopm]] and
    * [[bpeSelectSeqBatch]]) is what
    * makes one pass sound: consecutive hit positions would need the
    * shared middle token to be w2 of one pair and w1 of another, so
    * under disjointness a run of hits always belongs to ONE pair with
    * w1 = w2 — precisely the repeated-token case the even-offset run
    * rule already resolves.
    */
  private def bpeApplySet(cur: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val wg = Window.partitionBy(col("doc_id"), col("grp"))
    val hit = pairs.map { case (a, b) =>
      col("tok") === lit(a) && coalesce(col("nxt") === lit(b), lit(false))
    }.reduce(_ || _)
    bpeAdj(cur)
      .withColumn("hit", hit)
      .withColumn("grp", sum(when(col("hit"), 0).otherwise(1)).over(wd))
      .withColumn("take", col("hit") &&
        ((col("pos") - min(when(col("hit"), col("pos"))).over(wg)) % 2 === 0))
      .withColumn("prevtake", coalesce(lag(col("take"), 1).over(wd), lit(false)))
      .filter(!col("prevtake"))
      .select(col("doc_id"), col("pos"),
        when(col("take"), concat(col("tok"), lit(" "), col("nxt")))
          .otherwise(col("tok")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, tok))), x -> x.tok)").as("toks"))
  }

  /** The shared CTE chain for the BPE family's oracles: round r
    * selects best_r from toks_(r-1)'s adjacency counts and rebuilds
    * toks_r with the identical windowed greedy rule. `applyLast`
    * controls whether round n's merge is applied (the trainer only
    * needs its selection; the apply query needs toks_n).
    *
    * Every CTE is AS MATERIALIZED: DuckDB inlines single-reference
    * CTEs, and with the per-round scalar subqueries multiplying
    * references the 6-round chain otherwise re-evaluates upstream
    * rounds combinatorially — measured at sf0.1: OOM after 278 s
    * inlined vs 20 s materialized, identical results.
    */
  private def bpeChainSql(n: Int, applyLast: Boolean): String = {
    val base =
      """toks0 AS MATERIALIZED (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
           FROM documents)"""
    val rounds = (1 to n).map { r =>
      val apply = if (r == n && !applyLast) "" else s""",
         h$r AS MATERIALIZED (SELECT doc_id, pos, tok, nxt,
                   (tok = (SELECT w1 FROM best$r)
                    AND coalesce(nxt = (SELECT w2 FROM best$r), false)) AS hit
                 FROM m$r),
         g$r AS MATERIALIZED (SELECT *, sum(CASE WHEN hit THEN 0 ELSE 1 END)
                        OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM h$r),
         t$r AS MATERIALIZED (SELECT *, hit AND ((pos - min(CASE WHEN hit THEN pos END)
                        OVER (PARTITION BY doc_id, grp)) % 2 = 0) AS take FROM g$r),
         e$r AS MATERIALIZED (SELECT doc_id, pos,
                   CASE WHEN take THEN tok || ' ' || nxt ELSE tok END AS tok,
                   coalesce(lag(take) OVER (PARTITION BY doc_id ORDER BY pos), false) AS prevtake
                 FROM t$r),
         toks$r AS MATERIALIZED (SELECT doc_id, list(tok ORDER BY pos) AS toks
                    FROM e$r WHERE NOT prevtake GROUP BY doc_id)"""
      s"""p$r AS MATERIALIZED (SELECT doc_id, unnest(toks) AS tok,
                unnest(range(1, len(toks) + 1)) - 1 AS pos FROM toks${r - 1}),
         m$r AS MATERIALIZED (SELECT doc_id, pos, tok,
                   lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM p$r),
         bg$r AS MATERIALIZED (SELECT tok AS w1, nxt AS w2, count(*) AS c
                  FROM m$r WHERE nxt IS NOT NULL GROUP BY 1, 2),
         best$r AS MATERIALIZED (SELECT w1, w2, c FROM bg$r ORDER BY c DESC, w1, w2 LIMIT 1)$apply"""
    }.mkString(",\n")
    s"$base,\n$rounds"
  }

  /** DuckDB twin of the n-round trainer: the chain's merge table. */
  private def bpeTrainSql(n: Int): String = {
    val sel = (1 to n)
      .map(r => s"SELECT CAST($r AS INT) AS round, w1, w2, CAST(c AS BIGINT) AS cnt FROM best$r")
      .mkString("\n UNION ALL ")
    s"WITH ${bpeChainSql(n, applyLast = false)}\n SELECT * FROM (\n $sel\n ) ORDER BY round"
  }

  /** DuckDB twin of the tokenizer APPLY: per-doc token counts before
    * and after all n learned merges (the compression report a
    * tokenizer build ends with). Zero-token docs never enter the
    * positions frame, so the final frame left-joins and coalesces.
    */
  private def bpeApplySql(n: Int): String =
    s"""WITH ${bpeChainSql(n, applyLast = true)}
        SELECT t0.doc_id,
               CAST(len(t0.toks) AS BIGINT) AS n_tokens_raw,
               CAST(coalesce(len(tn.toks), 0) AS BIGINT) AS n_tokens_bpe
        FROM toks0 t0 LEFT JOIN toks$n tn USING (doc_id)
        ORDER BY t0.doc_id"""

  /** SEQUENCE-EXACT batch acceptance (r18, the round-floor cut): from
    * the ranked candidate window of one pre-round pair aggregate,
    * accept the longest PREFIX of candidates that provably equals
    * what `limit` sequential top-1 rounds would pick, so a whole
    * batch of merges pays ONE aggregate + ONE windowed apply instead
    * of one each. Candidate k (after the always-correct first) is
    * accepted iff
    *  (a) PREFIX: every higher-ranked candidate was accepted — a
    *      blocked-but-unaccepted pair may still win a later
    *      sequential sub-round (its count need not drop), so any
    *      rejection ends the batch;
    *  (b) DISJOINT: it shares no token with the accepted set — then
    *      its adjacency count is INVARIANT under their application
    *      (a disjoint merge never creates or destroys this pair's
    *      adjacencies), so the emitted count equals the sequential
    *      round's count bit-for-bit;
    *  (c) NEW-PAIR BOUND: its count strictly exceeds every count a
    *      pair CREATED by the accepted merges could reach. Merging
    *      (a,b) creates only (x,"a b") pairs — each from an existing
    *      (x,a) adjacency, so ≤ maxIn(a) = max_x count(x,a) — and
    *      ("a b",y) pairs, each from (b,y), so ≤ maxOut(b); both
    *      bounds come from the SAME aggregate the candidates did.
    *      Strictness also covers ties (a tied new pair could win the
    *      lexicographic tie-break).
    * Old pairs never gain count under any merge (a merge only
    * consumes tokens), so nothing below the prefix can rise past it.
    * Result: the accepted batch IS the next |batch| merges of the
    * sequential trajectory — same pairs, same counts, same order —
    * which is what keeps bpeTrainSql/bpeApplySql (the m=1 sequential
    * oracles) exact over the batched loop.
    */
  private[graft] def bpeSelectSeqBatch(
      cands: Seq[(String, String, Long)],
      maxIn: Map[String, Long], maxOut: Map[String, Long],
      limit: Int): Seq[(String, String, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var used = Set.empty[String]
    var bound = 0L
    var i = 0
    var stop = false
    while (i < cands.size && out.size < limit && !stop) {
      val (a, b, c) = cands(i)
      if (out.isEmpty || (!used(a) && !used(b) && c > bound)) {
        out += ((a, b, c))
        used = used + a + b
        bound = math.max(bound,
          math.max(maxIn.getOrElse(a, 0L), maxOut.getOrElse(b, 0L)))
      } else stop = true
      i += 1
    }
    out.toSeq
  }

  /** Run the n-merge BPE trainer once — the SAME m=1 sequential
    * trajectory as ever (bpeTrainSql stays its exact oracle), but
    * computed in batched rounds (r18): per round ONE vocabulary-sized
    * pair aggregate yields the ranked candidate window plus the
    * new-pair bounds, [[bpeSelectSeqBatch]] accepts the provably-
    * sequential prefix, and one windowed pass applies the whole batch
    * (token-disjointness is exactly [[bpeApplySet]]'s precondition).
    * On corpora whose top pairs are token-disjoint with headroom over
    * the bound — the common case; the organic documents corpus
    * batches all 6 merges in one round — the 6-round × 2-corpus-pass
    * loop collapses to 1 aggregate + 1 apply. Worst case (every
    * adjacent candidate conflicts) degrades to the old one-merge
    * rounds, never to a different sequence. Returns the merge table
    * AND the final token frame with every learned merge applied — the
    * one loop feeding both q_bpe_train (the table) and q_bpe_apply
    * (the corpus), so the two cannot drift. A corpus that runs out of
    * pairs early stops cleanly (the oracle chain's empty best_r
    * rounds are no-ops).
    */
  private def bpeTrainLoop(s: SparkSession, d: String)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var cur = toksFrame(s, d).select(col("doc_id"), col("toks"))
    val table = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (table.size < bpeTrainRounds && !exhausted) {
      val counts = bpeAdj(cur).filter(col("nxt").isNotNull)
        .groupBy(col("tok").as("w1"), col("nxt").as("w2"))
        .agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val cands = counts
          .orderBy(col("c").desc, col("w1"), col("w2")).limit(bpeTopmCand)
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        if (cands.isEmpty) exhausted = true // no pairs left: a tiny corpus
        else {                              // fully merged before merge n
          // new-pair bounds for the candidate tokens only — two
          // token-set-filtered reductions over the CACHED vocabulary
          // aggregate, never a second corpus pass
          val ts = cands.flatMap(p => Seq(p._1, p._2)).distinct
          val maxIn = counts.filter(col("w2").isin(ts: _*))
            .groupBy(col("w2")).agg(max(col("c")).as("m")).collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val maxOut = counts.filter(col("w1").isin(ts: _*))
            .groupBy(col("w1")).agg(max(col("c")).as("m")).collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val batch = bpeSelectSeqBatch(cands, maxIn, maxOut,
            bpeTrainRounds - table.size)
          batch.foreach { case (a, b, c) => table += ((table.size + 1, a, b, c)) }
          cur = bpeApplySet(cur, batch.map(p => (p._1, p._2)))
          // eager-checkpoint ONLY when another round will re-aggregate
          // this frame (guide §1: don't compute what you throw away).
          // After the LAST batch the apply stays lazy: q_bpe_train
          // never evaluates it (it emits only the merge table — the
          // final windowed corpus pass was pure waste there), and
          // q_bpe_apply evaluates it exactly once in its own sink.
          if (table.size < bpeTrainRounds) cur = cur.localCheckpoint(true)
        }
      } finally { counts.unpersist(blocking = false); () }
    }
    (table.toSeq, cur)
  }

  /** Top-m batched BPE parameters (q_bpe_train_topm): m merges per
    * round from a 4m-candidate window, over fewer rounds — the shape
    * real vocabulary builds use (one pair aggregate amortizes across
    * m merges instead of one).
    */
  private[graft] val bpeTopmM = 8
  private[graft] val bpeTopmRounds = 3
  private[graft] val bpeTopmCand = 32

  /** The batched-round CONFLICT RULE, identical on both engines: rank
    * the top `bpeTopmCand` pairs by (count desc, w1, w2); a candidate
    * is kept iff NO higher-ranked candidate (kept or not) shares a
    * token with it; the round's batch is the first m kept. Blocking
    * on all higher-ranked candidates — not just accepted ones — keeps
    * the rule order-independent and join-expressible (the oracle's
    * NOT EXISTS, no recursion); it is slightly conservative (a
    * blocked pair may block further pairs), which costs at most
    * re-selecting the blocked pair next round. Kept pairs are
    * pairwise token-DISJOINT, the precondition of [[bpeApplySet]].
    */
  private def bpeSelectTopm(cands: Seq[(String, String, Long)])
      : Seq[(String, String, Long)] = {
    val kept = cands.zipWithIndex.filter { case ((w1, w2, _), i) =>
      cands.take(i).forall { case (h1, h2, _) =>
        h1 != w1 && h1 != w2 && h2 != w1 && h2 != w2
      }
    }.map(_._1)
    kept.take(bpeTopmM)
  }

  /** The top-m trainer: per round ONE vocabulary-sized pair aggregate
    * reduced to a 4m-row driver read (never corpus-sized), the
    * blocking-rule selection, and one batched window apply. Emits the
    * full merge table (round, sel, w1, w2, cnt). Counts are the
    * PRE-round adjacency counts for every pair in the batch — the
    * standard batched-BPE approximation, and exactly where the top-m
    * and m×top-1 trajectories diverge (GroundTruthSpec pins a
    * fixture where they do).
    */
  private def bpeTrainTopmLoop(s: SparkSession, d: String)
      : Seq[(Int, Int, String, String, Long)] = {
    var cur = toksFrame(s, d).select(col("doc_id"), col("toks"))
    val table = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= bpeTopmRounds && !exhausted) {
      val cands = bpeAdj(cur).filter(col("nxt").isNotNull)
        .groupBy(col("tok").as("w1"), col("nxt").as("w2"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w1"), col("w2")).limit(bpeTopmCand).collect()
        .map(row => (row.getString(0), row.getString(1), row.getLong(2))).toSeq
      val sel = bpeSelectTopm(cands)
      if (sel.isEmpty) exhausted = true
      else {
        sel.zipWithIndex.foreach { case ((a, b, c), i) =>
          table += ((r, i + 1, a, b, c))
        }
        // the trainer emits only the merge table, so the FINAL round's
        // rebuilt corpus has no consumer — skip its windowed apply
        // outright (guide §1: don't compute what you throw away). All
        // earlier rounds still apply+checkpoint so the next aggregate
        // counts the merged sequences.
        if (r < bpeTopmRounds)
          cur = bpeApplySet(cur, sel.map(p => (p._1, p._2))).localCheckpoint(true)
      }
      r += 1
    }
    table.toSeq
  }

  /** DuckDB twin of the top-m trainer: the same generated
    * MATERIALIZED CTE chain as [[bpeChainSql]], with the per-round
    * scalar best replaced by the ranked-candidate window + the
    * NOT-EXISTS blocking rule + the first-m cut, and the apply's hit
    * test replaced by a correlated EXISTS against the round's
    * selection set (NULL nxt falls out false, like the coalesce in
    * the m=1 chain).
    */
  private def bpeTopmSql(rounds: Int, m: Int, cand: Int): String = {
    val base =
      """toks0 AS MATERIALIZED (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
           FROM documents)"""
    val chain = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT doc_id, unnest(toks) AS tok,
                unnest(range(1, len(toks) + 1)) - 1 AS pos FROM toks${r - 1}),
         m$r AS MATERIALIZED (SELECT doc_id, pos, tok,
                   lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM p$r),
         bg$r AS MATERIALIZED (SELECT tok AS w1, nxt AS w2, count(*) AS c
                  FROM m$r WHERE nxt IS NOT NULL GROUP BY 1, 2),
         cand$r AS MATERIALIZED (SELECT w1, w2, c,
                    row_number() OVER (ORDER BY c DESC, w1, w2) AS rk
                  FROM bg$r ORDER BY rk LIMIT $cand),
         sel$r AS MATERIALIZED (SELECT w1, w2, c,
                    row_number() OVER (ORDER BY rk) AS sn
                  FROM cand$r c
                  WHERE NOT EXISTS (SELECT 1 FROM cand$r h WHERE h.rk < c.rk
                        AND (h.w1 = c.w1 OR h.w1 = c.w2 OR h.w2 = c.w1 OR h.w2 = c.w2))
                  ORDER BY sn LIMIT $m),
         h$r AS MATERIALIZED (SELECT doc_id, pos, tok, nxt,
                   EXISTS (SELECT 1 FROM sel$r s
                           WHERE s.w1 = m$r.tok AND s.w2 = m$r.nxt) AS hit
                 FROM m$r),
         g$r AS MATERIALIZED (SELECT *, sum(CASE WHEN hit THEN 0 ELSE 1 END)
                        OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM h$r),
         t$r AS MATERIALIZED (SELECT *, hit AND ((pos - min(CASE WHEN hit THEN pos END)
                        OVER (PARTITION BY doc_id, grp)) % 2 = 0) AS take FROM g$r),
         e$r AS MATERIALIZED (SELECT doc_id, pos,
                   CASE WHEN take THEN tok || ' ' || nxt ELSE tok END AS tok,
                   coalesce(lag(take) OVER (PARTITION BY doc_id ORDER BY pos), false) AS prevtake
                 FROM t$r),
         toks$r AS MATERIALIZED (SELECT doc_id, list(tok ORDER BY pos) AS toks
                    FROM e$r WHERE NOT prevtake GROUP BY doc_id)"""
    }.mkString(",\n")
    val sels = (1 to rounds)
      .map(r => s"SELECT CAST($r AS INT) AS round, CAST(sn AS INT) AS sel, w1, w2, CAST(c AS BIGINT) AS cnt FROM sel$r")
      .mkString("\n UNION ALL ")
    s"WITH $base,\n$chain\n SELECT * FROM (\n $sels\n ) ORDER BY round, sel"
  }

  /** Number of epochs for q_classifier_train — fixed so the weight
    * trajectory is a deterministic oracle target.
    */
  private[graft] val classifierTrainEpochs = 3

  /** md5-derived integer micro-weight for a hashed feature bucket `b`
    * — the classifier family's stand-in init (a warm-start table is a
    * broadcast map with an identical plan). Shared by the single-step
    * and multi-epoch trainers so their epoch-1 state cannot drift.
    */
  private val classifierWExpr =
    "CAST(conv(substring(md5(concat('w:', CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2000001 - 1000000"

  /** (doc_id, b, lang, dc) — per-document hashed-bucket token counts
    * with the label column carried through. ONE construction shared
    * by q_dsir_weights and both classifier trainers (the documented
    * cross-query feature-space identity), memoized so repeat calls
    * reuse one persisted frame and releaseCaches() can free it.
    */
  private def classifierDocb(s: SparkSession, d: String): DataFrame =
    memoized(s, s"classifierDocb:$d") {
      t(s, d, "documents")
        .selectExpr("doc_id", "lang",
          "filter(split(lower(text), '\\\\s+'), x -> x != '') AS toks")
        .select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
        .selectExpr("doc_id", "lang",
          "CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT) % 4096 AS b")
        .groupBy(col("doc_id"), col("b"))
        .agg(max(col("lang")).as("lang"), count(lit(1)).as("dc"))
    }

  /** DuckDB twin of [[classifierDocb]] — CTEs ending in
    * `docb(doc_id, b, lang, dc)`, shared by the q_dsir_weights and
    * classifier-trainer oracles so the hashed feature space cannot
    * drift between them.
    */
  private val classifierCteSql =
    """t AS (SELECT d.doc_id, d.lang,
           unnest(list_filter(string_split_regex(lower(d.text), '\s+'), x -> x != '')) AS tok
         FROM documents d),
      tb AS (SELECT doc_id, lang,
               ('0x' || substr(md5(tok), 1, 15))::BIGINT % 4096 AS b
             FROM t),
      docb AS (SELECT doc_id, b, max(lang) AS lang, count(*) AS dc
               FROM tb GROUP BY doc_id, b)"""

  /** DuckDB twin of [[classifierWExpr]] as a named weight-init CTE. */
  private def classifierWInitCte(name: String) =
    s"""$name AS (SELECT DISTINCT b,
          ('0x' || substr(md5('w:' || CAST(b AS VARCHAR)), 1, 15))::BIGINT % 2000001 - 1000000 AS w
        FROM docb)"""

  /** DuckDB twin of the multi-epoch trainer: a generated CTE chain —
    * epoch e scores against w(e-1), reduces the integer gradient, and
    * updates with symmetric toward-zero truncation of grad/n_docs
    * (`//` on the non-negative magnitude — floor equals truncate
    * there, so Spark's DIV and DuckDB's // agree even though they
    * disagree on negative operands).
    */
  private def classifierTrainSql(epochs: Int): String = {
    val base =
      s"""$classifierCteSql,
        nd AS (SELECT count(DISTINCT doc_id) AS n FROM docb),
        ${classifierWInitCte("w0")}"""
    val chain = (1 to epochs).map { e =>
      s"""pd$e AS (SELECT d.doc_id, max(d.lang) AS lang,
                 CAST(sum(d.dc * w.w) AS BIGINT) AS sw,
                 CAST(sum(d.dc) AS BIGINT) AS n
               FROM docb d JOIN w${e - 1} w ON d.b = w.b GROUP BY d.doc_id),
         rs$e AS (SELECT doc_id,
                  CAST(round(1000000 * ((CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                     - 1.0 / (1.0 + exp(-(CAST(sw AS DOUBLE) / (1e6 * n)))))) AS BIGINT) AS r
                FROM pd$e),
         g$e AS (SELECT d.b, CAST(sum(d.dc * r.r) AS BIGINT) AS g
               FROM docb d JOIN rs$e r USING (doc_id) GROUP BY d.b),
         w$e AS (SELECT w.b,
                  w.w + coalesce(CASE WHEN g.g >= 0 THEN g.g // (SELECT n FROM nd)
                                      ELSE -((-g.g) // (SELECT n FROM nd)) END, 0) AS w
                FROM w${e - 1} w LEFT JOIN g$e g ON w.b = g.b),
         m$e AS (SELECT CAST($e AS INT) AS epoch,
                  CAST((SELECT count(*) FROM pd$e WHERE (sw > 0) = (lang = 'en')) AS BIGINT) AS n_correct,
                  CAST((SELECT n FROM nd) AS BIGINT) AS n_docs,
                  CAST((SELECT sum(w) FROM w$e) AS BIGINT) AS w_sum,
                  CAST((SELECT sum(abs(w)) FROM w$e) AS BIGINT) AS w_l1)"""
    }.mkString(",\n")
    val sel = (1 to epochs).map(e => s"SELECT * FROM m$e").mkString("\n UNION ALL ")
    s"WITH $base,\n$chain\n SELECT * FROM (\n $sel\n ) ORDER BY epoch"
  }

  /** Corpus vocabulary size (distinct tokens) — one scalar per
    * dataset, memoized like nDocs; the add-one smoothing denominator.
    */
  private val vocabMemo = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def vocabSize(s: SparkSession, d: String): Long =
    vocabMemo.getOrElseUpdate(d, toksFrame(s, d)
      .select(explode(col("toks")).as("tok"))
      .agg(countDistinct(col("tok"))).head.getLong(0))

  private def shingleRows(s: SparkSession, d: String): DataFrame = memoized(s, s"shingles:$d") {
    gramRows(s, d, 3)
      .select(col("doc_id"), col("g").as("sh"))
      // the exploded-distinct output is the frame every consumer
      // branches from (df counts, anti-join sides, signature hashing,
      // co-count sides) — the memoized persist makes each branch read
      // rows, not the window pipeline
      .distinct()
  }

  /** Distinct (doc_id, g) word-8-gram rows, memoized for the same
    * reason as shingleRows: both decontamination consumers branch
    * into an eval side and a training side from this frame, and the
    * persist makes each branch read rows instead of re-running the
    * window pipeline.
    */
  private def gram8Rows(s: SparkSession, d: String): DataFrame = memoized(s, s"grams8:$d") {
    gramRows(s, d, 8).select(col("doc_id"), col("g")).distinct()
  }

  /** (doc_id, g) training-gram rows that hit the eval slice's gram
    * set — the contamination relation shared by the decontamination
    * report (per-doc counts) and the curation funnel (distinct ids),
    * mirroring the shared gram8Cte on the oracle side.
    */
  private def contaminationHits(s: SparkSession, d: String): DataFrame = {
    val grams = gram8Rows(s, d)
    grams.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(grams.filter(col("doc_id") % 50 === 0)
        .select(col("g")).distinct()), Seq("g"))
  }

  /** DuckDB mirror of gramRows(_, _, 8) + the eval-slice gram set, as
    * CTE bodies (inv = distinct (doc_id, g) 8-gram rows; eval_g = the
    * doc_id % 50 == 0 slice's grams) — shared by decontamination and
    * the curation-funnel capstone so the two oracles cannot drift.
    */
  private val gram8Cte =
    """docs8 AS (
           SELECT doc_id,
             CASE WHEN len(toks) >= 8 THEN
               list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
                              toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7]
                              for i in range(1, len(toks)-6)])
             ELSE [] END AS ng
           FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
                 FROM documents)),
         inv AS (SELECT doc_id, unnest(ng) AS g FROM docs8),
         eval_g AS (SELECT DISTINCT g FROM inv WHERE doc_id % 50 = 0)"""

  /** DuckDB mirror of ngDocs as a CTE body. */
  private val ngCte =
    """WITH docs AS (
         SELECT doc_id, source,
           CASE WHEN len(toks) >= 3 THEN
             list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            for i in range(1, len(toks)-1)])
           ELSE [] END AS ng
         FROM (SELECT doc_id, source,
                 list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
               FROM documents))"""

  /** (doc_id, m) winnowing minima rows (with duplicates — consumers
    * distinct/aggregate): every word-5-gram is hashed, each window of
    * 4 consecutive grams contributes its minimum. Shared by the
    * declared fingerprint query and the planted-duplicate sketch-
    * overlap gate.
    */
  private[graft] def winnowMinima(s: SparkSession, d: String): DataFrame = {
    val wLead = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // gram hash is an md5-derived 60-bit int, NOT xxhash64: DuckDB
    // computes the identical value as ('0x'||substr(md5(g),1,15))::BIGINT
    // (the q_sample_weighted trick), which is what makes the whole
    // winnowing sketch engine-independent and hence fully oracle-able.
    val grams = gramRows(s, d, 5)
      .select(col("doc_id"), col("pos"),
        expr("CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT)").as("gh"))
    val wWin = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, 3)
    grams
      // full windows only (proper winnowing): a trailing partial
      // window would always admit the final gram's hash. The min is
      // computed over ALL grams first; the filter then keeps only
      // rows that START a full 4-gram window.
      .select(col("doc_id"),
        min(col("gh")).over(wWin).as("m"),
        lead(col("gh"), 3).over(wLead).as("g3"))
      .filter(col("g3").isNotNull)
      .select(col("doc_id"), col("m"))
  }

  /** (doc_id, span_start, span_len) maximal duplicated token spans:
    * every word-8-gram occurring in more than one document marks its
    * start, and runs of consecutive duplicated starts merge via
    * gaps-and-islands; spans of >= 16 tokens are reported. Shared by
    * the span report (q_dedup_spans) and the span remover
    * (q_dedup_spans_apply).
    */
  private def dupSpans(s: SparkSession, d: String): DataFrame = {
    val wg = Window.partitionBy(col("g"))
    islandSpans(gramRows(s, d, 8)
      .withColumn("mn", min(col("doc_id")).over(wg))
      .withColumn("mx", max(col("doc_id")).over(wg))
      .filter(col("mn") =!= col("mx")))
  }

  /** Keep-one-copy variant of [[dupSpans]]: the canonical holder of a
    * duplicated 8-gram is min(doc_id) over the docs containing it —
    * that doc's occurrence is NOT marked, every other doc's is, so the
    * canonical copy of a duplicated span survives excision while the
    * other copies lose it. The keeper identity is per-GRAM (it rides
    * the same window min the >1-docs test already computes — zero
    * extra plan cost): a span whose copies all come from one source
    * has a single well-defined keeper; an island stitched from grams
    * with different canonical holders splits conservatively at the
    * holder boundary, which only ever PRESERVES more text. Same one
    * by-gram exchange, same islands — still no join of any kind.
    */
  private def dupSpansKeepOne(s: SparkSession, d: String): DataFrame = {
    val wg = Window.partitionBy(col("g"))
    islandSpans(gramRows(s, d, 8)
      .withColumn("mn", min(col("doc_id")).over(wg))
      .withColumn("mx", max(col("doc_id")).over(wg))
      .filter(col("mn") =!= col("mx") && col("doc_id") =!= col("mn")))
  }

  /** Gaps-and-islands over marked (doc_id, pos) gram starts → maximal
    * spans of >= 16 tokens. The merge step shared by every span
    * producer (corpus-dup spans, eval-leak spans).
    */
  private def islandSpans(marked: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("island", col("pos") - row_number().over(wd))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
           (max(col("pos")) - min(col("pos")) + lit(8)).as("span_len"))
      .filter(col("span_len") >= 16)
      .select(col("doc_id"), col("span_start"), col("span_len"))
  }

  /** DuckDB mirror of the positioned 8-gram frame (toks + g8 CTEs),
    * shared by every span oracle.
    */
  private val gramPosCte =
    """toks AS (SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
                FROM documents),
       g8 AS (SELECT doc_id,
                unnest(range(1, len(toks) - 6)) - 1 AS pos,
                unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
                        toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7]
                        for i in range(1, len(toks) - 6)]) AS g
              FROM toks)"""

  /** DuckDB mirror of [[dupSpans]] as CTE bodies ending in
    * `spans(doc_id, span_start, span_len)` — shared by both
    * corpus-dup span oracles so they cannot drift.
    */
  private val spansCte =
    s"""$gramPosCte,
       dup AS (SELECT g FROM g8 GROUP BY g HAVING min(doc_id) <> max(doc_id)),
       isl AS (SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
               FROM g8 WHERE g IN (SELECT g FROM dup)),
       spans AS (SELECT doc_id, min(pos) AS span_start, max(pos) - min(pos) + 8 AS span_len
                 FROM isl GROUP BY doc_id, island
                 HAVING max(pos) - min(pos) + 8 >= 16)"""

  /** DuckDB mirror of [[dupSpansKeepOne]] — same CTE tail name
    * `spans(doc_id, span_start, span_len)`, with the per-gram
    * canonical-holder (min doc_id) exempt from marking.
    */
  private val keep1SpansCte =
    s"""$gramPosCte,
       mk AS (SELECT doc_id, pos,
                min(doc_id) OVER (PARTITION BY g) AS mn,
                max(doc_id) OVER (PARTITION BY g) AS mx
              FROM g8),
       isl AS (SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
               FROM mk WHERE mn <> mx AND doc_id <> mn),
       spans AS (SELECT doc_id, min(pos) AS span_start, max(pos) - min(pos) + 8 AS span_len
                 FROM isl GROUP BY doc_id, island
                 HAVING max(pos) - min(pos) + 8 >= 16)"""

  /** The span-removal consumer shared by the remove-all and
    * keep-one-copy apply queries: span lists group per doc (tiny),
    * ONE keyed left join carries them to the corpus, and removal is a
    * map-side higher-order filter over the token array — no
    * token-level join. Docs without spans pass through verbatim.
    */
  private def applySpansDf(s: SparkSession, d: String, spans: DataFrame): DataFrame = {
    val sp = spans
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start").as("s"), col("span_len").as("l"))).as("spans"))
    toksFrame(s, d)
      .join(sp, Seq("doc_id"), "left")
      .selectExpr("doc_id", "size(toks) AS n_toks",
        """CASE WHEN spans IS NULL THEN toks ELSE
             filter(toks, (x, i) -> NOT exists(spans, sp -> i >= sp.s AND i < sp.s + sp.l))
           END AS clean""")
      .selectExpr("doc_id",
        "array_join(clean, ' ') AS clean_text",
        "n_toks - size(clean) AS n_removed")
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[applySpansDf]] over any CTE chain ending in
    * `spans(doc_id, span_start, span_len)` (and exposing `toks`).
    */
  private def applySpansSql(cte: String): String =
    s"""WITH $cte,
        sp AS (SELECT doc_id, list({'s': span_start, 'l': span_len}) AS spans
               FROM spans GROUP BY doc_id)
        SELECT doc_id,
               coalesce(array_to_string(clean, ' '), '') AS clean_text,
               n_toks - len(clean) AS n_removed
        FROM (SELECT t.doc_id, len(t.toks) AS n_toks,
                CASE WHEN sp.spans IS NULL THEN t.toks ELSE
                  [t.toks[i] for i in range(1, len(t.toks) + 1)
                   if len(list_filter(sp.spans, x -> i - 1 >= x.s AND i - 1 < x.s + x.l)) = 0]
                END AS clean
              FROM toks t LEFT JOIN sp USING (doc_id))
        ORDER BY doc_id"""

  /** (doc_id, simhash): simhash over DISTINCT lowercased tokens.
    * Tokens are EXPLODED to rows: one codegen'd md5-derived 60-bit
    * hash per token (the engine-independent construction from
    * winnowMinima — DuckDB computes the identical value, which is
    * what gives q_dedup_simhash a full oracle), then a 60-column
    * conditional-sum hash aggregate builds the bit counters, and one
    * projection folds them into the hash value — no interpreted
    * array lambdas in the hot path. Shared by the declared near-dup
    * query and the planted-duplicate gate (which recomputes
    * exhaustive Hamming truth from these values).
    */
  private[graft] val simhashBits = 60

  private[graft] def simhashes(s: SparkSession, d: String): DataFrame = {
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val tokens = t(s, d, "documents")
      .repartition(parts, col("doc_id"))
      .selectExpr("doc_id",
        "array_distinct(filter(split(lower(text), '\\\\s+'), x -> x != '')) AS toks")
      .filter(size(col("toks")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)  // barrier before explode (see shingleRows)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
    val cntCols = (0 until simhashBits).map(i =>
      sum(when(expr(s"(shiftright(h, $i) & 1L) = 1L"), 1).otherwise(-1)).as(s"c$i"))
    val cnt = tokens
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .groupBy(col("doc_id")).agg(cntCols.head, cntCols.tail: _*)
    val simExpr = (0 until simhashBits)
      .map(i => s"IF(c$i >= 0, shiftleft(1L, $i), 0L)").mkString(" | ")
    cnt.selectExpr("doc_id", s"($simExpr) AS simhash")
  }

  /** Manku-style block-permutation band keys for the simhashes
    * (Manku/Jain/Sarma, "Detecting Near-Duplicates for Web Crawling",
    * WWW'07 §3): the 64 bit positions split into 6 blocks (4×11 +
    * 2×10 bits; positions ≥ simhashBits are constant-zero, which only
    * shaves key entropy in the last block);
    * a pair within Hamming distance 3 has its differing bits in at
    * most 3 blocks, so at least one of the C(6,3)=20 3-block
    * combinations is clean on BOTH sides (pigeonhole) — the same
    * lossless Hamming≤3 guarantee as 4×16-bit chunks, but each table
    * keys on ~32 concatenated bits: expected random-collision
    * candidate volume is 20·n²/2^32 instead of 4·n²/2^16. 16-bit
    * keys stop spreading once n passes ~10^5 (the r7 scale finding);
    * 32-bit keys hold to ~10^9 docs, and the block split widens
    * mechanically if corpora outgrow that.
    */
  private[graft] val simhashBlocks: Vector[(Int, Int)] =
    Vector((0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10))

  private[graft] def simhashBandKeys: Seq[String] = {
    def block(i: Int): String = {
      val (off, w) = simhashBlocks(i)
      s"(shiftright(simhash, $off) & ${(1L << w) - 1}L)"
    }
    simhashBlocks.indices.combinations(3).map { c =>
      val (i, j, k) = (c(0), c(1), c(2))
      val (wj, wk) = (simhashBlocks(j)._2, simhashBlocks(k)._2)
      s"(shiftleft(${block(i)}, ${wj + wk}) | shiftleft(${block(j)}, $wk) | ${block(k)})"
    }.toSeq
  }

  /** Candidate near-dup pairs from the 20 block-permutation tables:
    * (doc_a, doc_b, hamming) for every pair agreeing on at least one
    * table's 3-block key. Exposed separately from the declared query
    * so the spec can gate CANDIDATE volume (sub-quadratic growth),
    * not just the post-Hamming-filter result.
    */
  private[graft] def simhashCandidates(s: SparkSession, d: String): DataFrame = {
    // memoized, not bare-persisted: repeat callers (the declared
    // query, the lossless gate, the candidate-volume gate) reuse one
    // cached frame instead of accreting orphaned persists
    val banded = memoized(s, s"simhash-banded:$d") {
      simhashes(s, d)
        .selectExpr("doc_id", "simhash",
          s"posexplode(array(${simhashBandKeys.mkString(", ")})) AS (tbl, bkey)")
    }
    banded.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"),
        col("tbl"), col("bkey")).as("a")
      .join(banded.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"),
          col("tbl"), col("bkey")).as("b"),
        Seq("tbl", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(sim_a ^ sim_b) AS BIGINT)").as("hamming"))
      .distinct()
  }

  /** DuckDB mirror of the simhash near-dup result: identical per-doc
    * simhashes (same md5-derived token hashes, same bit counters),
    * then the EXHAUSTIVE Hamming<=3 pair set — the oracle needs no
    * banding because correctness, not scale, is its job; the
    * lossless-bucketing gate proves the banded Spark plan returns
    * exactly this set.
    */
  private val simhashOracleSql: String = {
    val cnts = (0 until simhashBits).map(i =>
      s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS c$i")
      .mkString(",\n                  ")
    val simExpr = (0 until simhashBits)
      .map(i => s"CASE WHEN c$i >= 0 THEN (1::BIGINT << $i) ELSE 0::BIGINT END")
      .mkString(" | ")
    s"""WITH toks AS (SELECT doc_id, unnest(list_distinct(
              list_filter(string_split_regex(lower(text), '\\s+'), x -> x != ''))) AS tok
            FROM documents),
          hashed AS (SELECT doc_id,
              CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) AS h FROM toks),
          cnt AS (SELECT doc_id,
                  $cnts
                  FROM hashed GROUP BY doc_id),
          sims AS (SELECT doc_id, ($simExpr) AS simhash FROM cnt)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
          FROM sims a JOIN sims b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
          ORDER BY doc_a, doc_b"""
  }

  /** Exact n-gram Jaccard near-dup pairs (doc_a, doc_b, jaccard >= 0.6)
    * with the stop-shingle cutoff — shared by the declared pair query
    * and the connected-components clustering.
    */
  /** DuckDB mirror of maxDfFor — `//` is DuckDB integer floor
    * division, matching the Scala Long division exactly (cap
    * included, inert below 100M docs).
    */
  private val maxDfSql =
    "least(100000, greatest(100, (SELECT count(*) // 1000 FROM documents)))"

  /** Corpus-size crossover for the n-gram co-count route (r19 A/B,
    * BENCH_sf1.md): the double-exchange self-join wins below it (5k
    * docs: 1.90 vs 2.14 s medians), the single by-shingle exchange
    * wins from 15k docs up (3.61 vs 4.57) and widens with scale. Both
    * plans emit identical pairs, so the route is invisible to the
    * oracle.
    */
  private[graft] val ngramCoRouteMin = 10000L

  private def ngramPairs(s: SparkSession, d: String): DataFrame = {
    val maxDf = maxDfFor(nDocs(s, d))
    val inv0 = shingleRows(s, d)
    val hot = inv0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("sh"))
    val inv = inv0.join(broadcast(hot), Seq("sh"), "left_anti")
    val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // co-counts, SIZE-ROUTED (r19 — the adjudicated settlement of the
    // r18 rewrite; isolated 3-run medians in BENCH_sf1.md):
    //  - small corpora (< ngramCoRouteMin docs): the a⋈b self-join.
    //    It shuffles+sorts the inverted index twice, but at this size
    //    both exchanges are cheap and it avoids the posting-list
    //    aggregate's sort (join 1.90/2.35 s vs one-exchange 2.14/2.81
    //    at 5k docs, ngram/clusters medians).
    //  - at scale: ONE by-shingle exchange — group the inverted index
    //    by shingle, posexplode each sorted posting list per anchor
    //    element, explode the anchor's successor slice, count. Pair
    //    volume is identical to the join (Σ C(df,2), df ≤ maxDf by
    //    the stop-shingle cutoff), doc_a < doc_b by the sort, and no
    //    row ever holds more than O(maxDf) values (the r18
    //    flatten-all-pairs form held O(maxDf²) per row — executor-OOM
    //    at 10M-doc maxDf — AND lost its wall-clock claim: 2.50 s at
    //    5k docs vs the join's 1.90; deleted). Anchor wins from 15k
    //    docs (3.61 vs 4.57) and widens at 50k (5.55/5.60 vs
    //    6.30/7.22) — the exchange count, not pair volume, dominates
    //    once the inverted index outgrows its sort buffers.
    val co = (if (nDocs(s, d) < ngramCoRouteMin)
        inv.as("a").join(inv.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      else
        inv.groupBy(col("sh"))
          .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
          .filter(size(col("ds")) > 1)
          .selectExpr("ds", "posexplode(ds) AS (i, doc_a)")
          .selectExpr("doc_a",
            "explode(slice(ds, i + 2, size(ds))) AS doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    co.join(sizes.as("sa"), col("sa.doc_id") === col("doc_a"))
      .join(sizes.as("sb"), col("sb.doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
  }

  /** Connected components over an undirected edge list via alternating
    * large-star / small-star contraction (the MapReduce CC algorithm of
    * Kiveris et al., "Connected Components in MapReduce and Beyond" —
    * the production-scale replacement for plain min-label propagation):
    * O(log n) rounds for ANY component diameter, and every round
    * shuffles only |edges| rows — the corpus never enters the loop.
    *
    * large-star: each node connects its LARGER neighbors to the minimum
    * of its closed neighborhood; small-star connects the smaller ones.
    * Alternating the two contracts every component to a star rooted at
    * its minimum; the fixed point is detected with one tiny aggregate
    * per round (count + order-independent hash-sum), not a separate
    * isEmpty job over relabeled data.
    *
    * Hybrid routing (the same design as the engine's no-Spark-job
    * point-lookup path): a DRIVER-SIDE union-find serves edge sets
    * below `driverMax` — near-dup edge sets are usually a vanishing
    * fraction of the corpus, and a Spark job per contraction round is
    * the wrong tool for a driver-sized graph (each round costs fixed
    * scheduler latency regardless of size). The distributed loop is
    * the ≥ driverMax path, where the edge set itself no longer fits
    * one machine. Both paths produce the identical min-root labeling
    * (union-by-min keeps every component rooted at its minimum), and
    * the equivalence is spec-gated on the same fixtures.
    *
    * @param edges (src, dst) pairs, any orientation, self-loops ignored
    * @param driverMax edge-count cutoff for the driver-side fast path
    *        (default 1M edges ≈ 40 MB collected as primitive-long
    *        tuples; pass -1 to force the distributed loop)
    * @return ((node, root) for every node present in `edges`,
    *         changed-rounds until the fixed point — 0 on the driver path)
    */
  private[graft] def starComponents(edges: DataFrame,
                                    driverMax: Long = 1L << 20): (DataFrame, Int) = {
    def signature(e: DataFrame): (Long, Long) = {
      // bit_xor: order-independent like sum but overflow-free under
      // ANSI mode (edges are distinct, so xor can't self-cancel a dup)
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // large-star: symmetrize, m = min(neighborhood ∪ {self}); emit
    // (v, m) for neighbors v > u. Output is oriented src > dst. NOT
    // deduplicated: smallStar's min-window is insensitive to duplicate
    // rows and its own distinct() canonicalizes the round's output, so
    // a distinct here would be a whole extra shuffle per round for
    // nothing (the dup factor is bounded by the symmetrized degree).
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val w = Window.partitionBy(col("src"))
      sym.select(col("src"), col("dst"),
          least(min(col("dst")).over(w), col("src")).as("m"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
    }
    // small-star: on src>dst-oriented edges, m = min of the smaller
    // neighborhood; reconnect the smaller neighbors and self to m.
    def smallStar(e: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("src"))
      val withM = e.select(col("src"), col("dst"), min(col("dst")).over(w).as("m"))
      withM.filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(withM.select(col("src"), col("m").as("dst")))
        .distinct()
    }
    // LAZY localCheckpoint: the signature aggregate right after is the
    // materializing action, so each round costs ONE Spark job (the
    // eager variant spent a second job just to checkpoint — pure
    // scheduler overhead that compounds across rounds, and the
    // dominant cost of the whole query under load since the frames
    // are |edges|-sized). Lineage still truncates at materialization,
    // which is what keeps the per-round plan flat (largeStar
    // references e twice, so an untruncated plan doubles per round).
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint(false)
    var sig = signature(e)
    if (sig._1 <= driverMax) {
      // union-by-min with path compression: find() returns the
      // component minimum because every union attaches the larger
      // root UNDER the smaller one
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      // collect as specialized (Long, Long) tuples, not GenericRows:
      // ~40 B/edge → ~40 MB at the 1M default cutoff, driver-safe
      val spark = edges.sparkSession
      import spark.implicits._
      val collected = e.as[(Long, Long)].collect()
      collected.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = collected.iterator
        .flatMap(p => Iterator(p._1, p._2)).toArray.distinct
      return (nodes.map(n => (n, find(n))).toSeq.toDF("node", "root"), 0)
    }
    var rounds = 0
    var converged = sig._1 == 0L
    while (!converged && rounds < 50) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextSig = signature(next)
      converged = nextSig == sig
      if (!converged) rounds += 1
      e = next
      sig = nextSig
    }
    // fixed point: every edge is (member, component-min); roots appear
    // only on the dst side and map to themselves
    val labels = e.select(col("src").as("node"), col("dst").as("root"))
      .unionByName(
        e.select(col("dst").as("node"), col("dst").as("root")).distinct())
    (labels, rounds)
  }

  /** Per-doc quality frame (doc_id, n_tokens, mean_tok_len,
    * punct_ratio, stop_ratio, quality) — shared by the per-doc quality
    * report and the per-source quality mix; `qualitySql` is its exact
    * DuckDB mirror as a SELECT body. All ratios are IEEE divisions of
    * exact integers, so both consumers stay hash-exact with no
    * rounding tolerance.
    */
  private val qualitySql =
    s"""SELECT doc_id, n_tokens, mean_tok_len, punct_ratio, stop_ratio,
              CASE WHEN ${QualityRule.floorSql}
                   THEN 'ok' ELSE 'low' END AS quality
       FROM (
         SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS n_tokens,
                CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS DOUBLE)
                  / greatest(len(toks), 1) AS mean_tok_len,
                CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                  / greatest(length(text), 1) AS punct_ratio,
                CAST(len(list_filter(toks, x -> x IN (${QualityRule.stopListSql}))) AS DOUBLE)
                  / greatest(len(toks), 1) AS stop_ratio
         FROM (SELECT doc_id, text,
                 list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS toks
               FROM documents))"""

  private def qualityFrame(s: SparkSession, d: String): DataFrame =
    toksFrame(s, d, withText = true)
      .selectExpr(
        "doc_id",
        "CAST(size(toks) AS BIGINT) AS n_tokens",
        "CAST(aggregate(toks, 0L, (a, x) -> a + length(x)) AS DOUBLE) / greatest(size(toks), 1) AS mean_tok_len",
        "CAST(regexp_count(text, '[.,;:!?]') AS DOUBLE) / greatest(length(text), 1) AS punct_ratio",
        s"CAST(size(filter(toks, x -> x IN (${QualityRule.stopListSql}))) AS DOUBLE) / greatest(size(toks), 1) AS stop_ratio")
      .selectExpr("doc_id", "n_tokens", "mean_tok_len", "punct_ratio", "stop_ratio",
        s"CASE WHEN ${QualityRule.floorSql} THEN 'ok' ELSE 'low' END AS quality")

  /** Gopher rule-battery CTE chain ending in `g(doc_id, n_words,
    * mean_word_len, symbol_ratio, alpha_ratio, stop_hits, keep)` —
    * shared by q_gopher_rules and the cross-modal funnel's oracle.
    * Lazy: interpolated into the eagerly-built `all` map.
    */
  private[queries] lazy val gopherCteSql: String =
    """gt AS (SELECT doc_id,
            list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
          FROM documents),
       gm AS (SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS DOUBLE)
                 / greatest(len(toks), 1) AS mean_word_len,
               CAST(len(list_filter(toks, x -> regexp_matches(x, '#|\.\.\.'))) AS DOUBLE)
                 / greatest(len(toks), 1) AS symbol_ratio,
               CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                 / greatest(len(toks), 1) AS alpha_ratio,
               CAST(len(list_intersect(toks,
                 ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
             FROM gt),
       g AS (SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio, stop_hits,
               CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                          AND mean_word_len BETWEEN 3 AND 10
                          AND symbol_ratio <= 0.1
                          AND alpha_ratio >= 0.8
                          AND stop_hits >= 2 THEN 1 ELSE 0 END AS INT) AS keep
             FROM gm)"""

  /** The ONE weighted-mixture fan-out, shared by batch q_mix_weighted
    * and the streaming ingest path (Streams.mixDocs) so the two
    * cannot drift: weights [0.25, 0.5, 1.0, 2.5] keyed by source
    * index % 4, split into integer base copies plus a fractional
    * threshold resolved by the deterministic per-doc integer hash
    * (doc_id · 2654435761 + 12345) mod 1e6 — a pure function of the
    * key, no RNG, identical on any engine and at any stream
    * position. Stateless map-side fan-out: works verbatim on batch
    * and streaming frames; input columns pass through plus copy_idx.
    *
    * The hash is computed in residue form — ((doc_id mod 1e6) ·
    * (2654435761 mod 1e6) + 12345) mod 1e6, identical by modular
    * arithmetic — because the direct product overflows int64 at
    * doc_id ≈ 3.5e9: Spark would wrap silently while DuckDB raises,
    * exactly at the billions-of-docs scale this fan-out targets.
    * The residue product is ≤ 1e12, overflow-free.
    */
  private[graft] def mixCopies(docs: DataFrame): DataFrame = {
    val wi = (expr("CAST(substring(source, 4, 10) AS INT)") % 4 + 1).cast("int")
    val base = element_at(typedlit(Seq(0, 0, 1, 2)), wi)
    val thr = element_at(typedlit(Seq(250000L, 500000L, 0L, 500000L)), wi)
    val r = pmod(pmod(col("doc_id"), lit(1000000L)) * lit(435761L) + lit(12345L),
      lit(1000000L))
    docs.withColumn("n_copies", base + when(r < thr, 1).otherwise(0))
      .filter(col("n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1), col("n_copies"))))
      .drop("n_copies")
  }

  /** Spark side of the `g` relation, unordered. */
  private[queries] def gopherFrame(s: SparkSession, d: String): DataFrame =
    toksFrame(s, d)
      .selectExpr(
        "doc_id",
        "CAST(size(toks) AS BIGINT) AS n_words",
        "CAST(aggregate(toks, 0L, (a, x) -> a + length(x)) AS DOUBLE) / greatest(size(toks), 1) AS mean_word_len",
        "CAST(size(filter(toks, x -> x rlike '#|\\\\.\\\\.\\\\.')) AS DOUBLE) / greatest(size(toks), 1) AS symbol_ratio",
        "CAST(size(filter(toks, x -> x rlike '[a-z]')) AS DOUBLE) / greatest(size(toks), 1) AS alpha_ratio",
        "CAST(size(array_intersect(toks, array('the','be','to','of','and','that','have','with'))) AS BIGINT) AS stop_hits")
      .selectExpr("doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "alpha_ratio", "stop_hits",
        """CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                      AND mean_word_len BETWEEN 3 AND 10
                      AND symbol_ratio <= 0.1
                      AND alpha_ratio >= 0.8
                      AND stop_hits >= 2 THEN 1 ELSE 0 END AS INT) AS keep""")

  private val langCase =
    """CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
            WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
            WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
            WHEN s_fr > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred"""

  /** DuckDB mirror of the full MinHash-LSH pipeline. Every hash is
    * md5-derived (base gram hash = 60-bit md5 prefix; family j
    * re-hashes the base's decimal repr with ':j'; band keys are md5
    * of the 4 comma-joined minima) so signature, bands, candidates,
    * and the Jaccard-verified pair set are all engine-independent —
    * computed identically by the Spark side below.
    */
  private val minhashOracleSql: String = {
    val mins = (0 until 16).map(j =>
      s"min(CAST(('0x'||substr(md5(CAST(hb AS VARCHAR)||':$j'),1,15)) AS BIGINT)) AS m$j")
      .mkString(",\n                  ")
    val bandSel = (0 until 4).map { b =>
      val cat = (b * 4 until b * 4 + 4).map(j => s"CAST(m$j AS VARCHAR)").mkString("||','||")
      s"SELECT doc_id, $b AS band, md5($cat) AS bh FROM sig"
    }.mkString("\n                UNION ALL ")
    s"""$ngCte,
          inv AS (SELECT doc_id, unnest(ng) AS sh FROM docs),
          hashed AS (SELECT doc_id, CAST(('0x'||substr(md5(sh),1,15)) AS BIGINT) AS hb FROM inv),
          sig AS (SELECT doc_id, count(*) AS n,
                  $mins
                  FROM hashed GROUP BY doc_id),
          bands AS ($bandSel),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
                   WHERE a.doc_id < b.doc_id),
          co AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
                 FROM cand c JOIN inv a ON a.doc_id = c.doc_a
                             JOIN inv b ON b.doc_id = c.doc_b AND b.sh = a.sh
                 GROUP BY 1, 2)
          SELECT doc_a, doc_b, jaccard FROM (
            SELECT co.doc_a, co.doc_b,
                   CAST(co.inter AS DOUBLE) / (sa.n + sb.n - co.inter) AS jaccard
            FROM co JOIN sig sa ON sa.doc_id = co.doc_a
                    JOIN sig sb ON sb.doc_id = co.doc_b)
          WHERE jaccard >= 0.6 ORDER BY doc_a, doc_b"""
  }

  /** (doc_id, source, n_tokens BIGINT, score BIGINT) for the
    * token-budget selection pair: the quality proxy is mean word
    * length in milli-chars — (n_chars*1000) div n_tokens — pure
    * integer arithmetic so the ranking is bit-identical across
    * engines (no float comparison anywhere near an ORDER BY).
    * Tokenization is the corpus-wide standard (split lower(text) on
    * \s+, drop empties), same as toksFrame / the oracle CTEs.
    * Memoized+persisted: q_select_budget consumes it twice (budget
    * totals + the ranked window) and the persist makes the second
    * consumer read rows instead of re-tokenizing.
    */
  private def selectionScores(s: SparkSession, d: String): DataFrame =
    memoized(s, s"selscores:$d") {
      t(s, d, "documents")
        .selectExpr(
          "doc_id", "source", "n_chars",
          "CAST(size(filter(split(lower(text), '\\\\s+'), x -> x != '')) AS BIGINT) AS n_tokens")
        .filter(col("n_tokens") > 0)
        .selectExpr("doc_id", "source", "n_tokens",
          "(n_chars * 1000L) div n_tokens AS score")
    }

  val all: Map[String, Q] = Map(

    // ---- exact dedup: hash-groupBy keep-list ------------------------------
    "q_dedup_exact" -> Q(
      """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
         FROM documents GROUP BY 1 ORDER BY h""") { (s, d) =>
      t(s, d, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
        .orderBy(col("h"))
    },

    // ---- document fingerprint: md5 of whitespace/punct-normalized text ----
    "q_fingerprint" -> Q(
      s"""SELECT doc_id, ${QualityRule.fpNormSqlDuck} AS fp
          FROM documents ORDER BY doc_id""") { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), QualityRule.fpNormCol.as("fp"))
        .orderBy(col("doc_id"))
    },

    // ---- incremental dedup (new batch vs existing corpus) -----------------
    // The production ingest shape: documents arrive in batches and
    // must dedup against the ALREADY-INGESTED corpus, not just within
    // the batch (CCNet/RefinedWeb pipelines re-crawl the same pages
    // every snapshot). Incoming slice here = doc_id % 10 == 9; the
    // rest is the existing corpus. 100 TB shape: the existing side is
    // corpus-sized and must NEVER shuffle — a fixed-byte fingerprint
    // bloom (Spark's own bloom_agg/bloom_contains, partial-aggregable
    // build) prunes incoming docs to candidates map-side (a miss is
    // definitely new — blooms have no false negatives), then ONE
    // streamed scan of the existing corpus against the BROADCAST
    // candidate set confirms real duplicates; the result is exact,
    // bloom false positives only cost candidate-verify work. The
    // incoming batch is the only relation that ever exchanges.
    "q_dedup_incremental" -> Q(
      s"""WITH f AS (SELECT doc_id, ${QualityRule.fpNormSqlDuck} AS fp
                     FROM documents),
          ex AS (SELECT DISTINCT fp FROM f WHERE doc_id % 10 <> 9),
          inc AS (SELECT doc_id, fp FROM f WHERE doc_id % 10 = 9)
         SELECT inc.doc_id,
                CAST(CASE WHEN ex.fp IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_dup
         FROM inc LEFT JOIN ex ON inc.fp = ex.fp
         ORDER BY inc.doc_id""") { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val f = t(s, d, "documents")
        .select(col("doc_id"), QualityRule.fpNormCol.as("fp"))
      val ex = f.filter(col("doc_id") % 10 =!= 9)
        .select(col("fp"), xxhash64(col("fp")).as("h"))
      val inc = f.filter(col("doc_id") % 10 === 9)
        .select(col("doc_id"), col("fp"), xxhash64(col("fp")).as("h"))
      ex.createOrReplaceTempView("graft_incr_existing")
      inc.createOrReplaceTempView("graft_incr_incoming")
      val nEx = ex.count()
      val (estItems, numBits) = QualityRule.bloomSizing(math.max(nEx, 1L))
      val cand = s.sql(
        s"""SELECT doc_id, fp FROM graft_incr_incoming
            WHERE bloom_contains(
              (SELECT bloom_agg(h, ${estItems}L, ${numBits}L) FROM graft_incr_existing), h)""")
        .localCheckpoint(false)
      // bloomSizing clamps at Spark's runtime-filter caps (4M items /
      // 64M bits); past that the filter saturates GRACEFULLY — false
      // positives grow, exactness never suffers — but the candidate
      // set stops being small, so the verify path is chosen by the
      // MEASURED candidate count (the checkpoint makes this free):
      // small → existing corpus STREAMS against the broadcast set (the
      // big side never shuffles); saturated → a shuffled semi-join,
      // which can never blow the driver
      val nCand = cand.count()
      val candFps = cand.select(col("fp")).distinct()
      // An explicit broadcast() hint bypasses Spark's size-based auto
      // threshold, so the cutoff must be BYTE-aware, not row-count-aware:
      // a 32-char md5 fingerprint costs ~80 B in an on-heap broadcast
      // hash relation, so cap the broadcast path at a 64 MB relation
      // (~800k candidates) — beyond that the shuffled semi-join is the
      // safe shape regardless of how the bloom sized itself.
      val bcastOk = nCand * 80L <= (64L << 20)
      val dupFps = ex.select(col("fp"))
        .join(if (bcastOk) broadcast(candFps) else candFps, Seq("fp"), "leftsemi")
        .distinct()
      val mark = dupFps.withColumn("hit", lit(1))
      inc.select(col("doc_id"), col("fp"))
        .join(if (bcastOk) broadcast(mark) else mark, Seq("fp"), "left")
        .selectExpr("doc_id",
          "CAST(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_dup")
        .orderBy(col("doc_id"))
    },

    // ---- quality-aware dedup: keep the BEST copy, not an arbitrary one ----
    // Exact dedup conventionally keeps min(doc_id) per fingerprint;
    // production pipelines keep the highest-QUALITY duplicate (the
    // re-crawl with the cleanest extraction — the RefinedWeb/CCNet
    // treatment). One mergeable max-of-struct aggregate (the q_lww_agg
    // idiom) picks argmax(score, then smallest doc_id) per fingerprint
    // group: lexicographic struct max is partial-aggregable, so the
    // exchange carries one candidate per (partition, fingerprint) —
    // never the duplicate groups themselves. Inputs are the shared
    // fingerprint normalization and the memoized classifier aggregate;
    // ties on score resolve by negated-id max = smallest doc_id,
    // deterministic on both engines.
    "q_dedup_keep_best" -> Q(
      s"""WITH $qmodelCteSql,
          f AS (SELECT doc_id, ${QualityRule.fpNormSqlDuck} AS fp
                FROM documents),
          sc AS (SELECT f.doc_id, f.fp, CAST(sw AS DOUBLE) / (1e6 * n) AS score
                 FROM f JOIN qm ON f.doc_id = qm.doc_id)
         SELECT fp,
                -(max(struct_pack(s := score, i := -doc_id))).i AS keep_id,
                (max(struct_pack(s := score, i := -doc_id))).s AS keep_score,
                count(*) AS n_copies
         FROM sc GROUP BY fp ORDER BY fp""") { (s, d) =>
      val f = t(s, d, "documents")
        .select(col("doc_id"),
          QualityRule.fpNormCol.as("fp"))
      f.join(qmodelAgg(s, d)
          .selectExpr("doc_id", "CAST(sw AS DOUBLE) / (1e6 * n) AS score"),
          Seq("doc_id"))
        .groupBy(col("fp"))
        .agg(max(struct(col("score").as("s"), (-col("doc_id")).as("i"))).as("best"),
          count(lit(1)).cast("bigint").as("n_copies"))
        .selectExpr("fp", "-best.i AS keep_id", "best.s AS keep_score", "n_copies")
        .orderBy(col("fp"))
    },

    // ---- character-entropy quality signal ---------------------------------
    // Shannon entropy of the character distribution per document — the
    // classic cheap gibberish/boilerplate screen (low entropy = runs
    // and repetition, abnormally high = random noise), complementing
    // q_text_repetition's token-level view. Cross-engine float
    // discipline (the q_lm_perplexity trick): per (doc, char) the
    // ln(count) term rounds to integer MICRO-NATS, so both per-doc
    // sums are exact integers and H = (n·round(1e6·ln n) − Σ cᵢ·round(
    // 1e6·ln cᵢ)) / (1e6·n) is a single IEEE division of exact
    // integers. Shape: explode to chars, ONE (doc,char) partial
    // aggregate (alphabet-bounded per doc), one per-doc aggregate —
    // both partial-aggregable, zero joins.
    "q_text_entropy" -> Q(
      """WITH ch AS (SELECT doc_id, unnest(string_split_regex(lower(text), '')) AS c
                     FROM documents),
          pt AS (SELECT doc_id, c, count(*) AS ci FROM ch
                 WHERE c <> '' GROUP BY doc_id, c),
          pm AS (SELECT doc_id, ci, CAST(round(ln(ci) * 1000000) AS BIGINT) AS mi FROM pt),
          ag AS (SELECT doc_id, CAST(sum(ci) AS BIGINT) AS n,
                        CAST(sum(ci * mi) AS BIGINT) AS sm
                 FROM pm GROUP BY doc_id)
         SELECT doc_id, n AS n_chars_tot,
                CAST(CAST(round(ln(n) * 1000000) AS BIGINT) * n - sm AS DOUBLE) / (1e6 * n) AS h_nats
         FROM ag ORDER BY doc_id""") { (s, d) =>
      // Empty-string "chars" are filtered on BOTH engines: a degenerate
      // empty document splits to [""] in Spark, which would otherwise be
      // counted as an alphabet symbol; with the filter an empty doc
      // simply has no char rows and drops out of the output identically
      // on both sides (TextOpsEdgeSpec pins this).
      t(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), "")).as("c"))
        .filter(col("c") =!= "")
        .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("ci"))
        .selectExpr("doc_id", "ci", "CAST(round(ln(ci) * 1000000) AS BIGINT) AS mi")
        .groupBy(col("doc_id"))
        .agg(sum(col("ci")).cast("bigint").as("n"),
          sum(col("ci") * col("mi")).cast("bigint").as("sm"))
        .selectExpr("doc_id", "n AS n_chars_tot",
          "CAST(CAST(round(ln(n) * 1000000) AS BIGINT) * n - sm AS DOUBLE) / (1e6 * n) AS h_nats")
        .orderBy(col("doc_id"))
    },

    // ---- token counting ---------------------------------------------------
    "q_text_tokens" -> Q(
      """SELECT doc_id,
                len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS n_tokens,
                CAST(length(text) AS BIGINT) AS n_chars_m
         FROM documents ORDER BY doc_id""") { (s, d) =>
      t(s, d, "documents").selectExpr(
        "doc_id",
        "CAST(size(filter(split(text, '\\\\s+'), x -> x != '')) AS BIGINT) AS n_tokens",
        "CAST(length(text) AS BIGINT) AS n_chars_m")
        .orderBy(col("doc_id"))
    },

    // ---- reproducible stratified sampling ---------------------------------
    // Hash-based sampling is THE reproducible sampling for training
    // pipelines: membership is a pure function of the key, so the
    // sample is stable across runs, engines, and partitionings — no
    // RNG state, no per-partition seeds. The md5-prefix string
    // comparison evaluates identically in Spark and DuckDB, so this
    // is oracle-exact. Per-source rates (even sources kept at ~25%,
    // odd at ~6%) are how real pipelines down-weight low-quality
    // sources. Map-only: the filter is codegen'd per row.
    "q_sample_stratified" -> Q(
      """SELECT doc_id, source FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
               CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN '40' ELSE '10' END
         ORDER BY doc_id""") { (s, d) =>
      t(s, d, "documents")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) <
          when(substring(col("source"), 4, 10).cast("int") % 2 === 0, "40").otherwise("10"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    // ---- document-length histogram ----------------------------------------
    // The length distribution drives every truncation/filter threshold
    // choice in a data pipeline; floor-bucketing keeps it exact in
    // both engines. One partial-aggregated shuffle of |buckets| rows.
    "q_text_histogram" -> Q(
      """SELECT CAST(floor(n_chars / 50) AS BIGINT) AS bucket,
                count(*) AS n, min(n_chars) AS lo, max(n_chars) AS hi
         FROM documents GROUP BY 1 ORDER BY 1""") { (s, d) =>
      t(s, d, "documents")
        .groupBy(floor(col("n_chars") / 50).cast("bigint").as("bucket"))
        .agg(count(lit(1)).as("n"), min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
        .orderBy(col("bucket"))
    },

    // ---- corpus vocabulary: Zipf head by term frequency -------------------
    // Drives stopword lists, tokenizer sanity checks, and the df
    // cutoffs used elsewhere in this file. One partial-aggregated
    // shuffle keyed by token: the aggregate output is VOCABULARY-
    // sized (millions of rows at 100 TB), not corpus-sized, so the
    // final global top-100 sort is trivial. The distinct-doc count
    // rides the same shuffle as a two-phase distinct aggregate.
    "q_vocab_topk" -> Q(
      """WITH toks AS (SELECT doc_id,
              unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS tok
            FROM documents)
         SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
         FROM toks GROUP BY tok ORDER BY tf DESC, tok LIMIT 100""") { (s, d) =>
      toksFrame(s, d)
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("tok"))
        .limit(100)
    },

    // ---- approximate heavy hitters (Misra-Gries sketch) --------------------
    // q_vocab_topk's exact plan shuffles a vocabulary-sized partial
    // aggregate; the 100 TB form is a mergeable frequent-items sketch
    // whose exchange is k rows PER PARTITION, independent of
    // vocabulary size (graft.functions.HeavyHitters — Misra-Gries
    // with the PODS'12 mergeable-summaries trim). Sketch contents
    // depend on merge order, so the gate verifies the sketch's three
    // PROVABLE guarantees against the exact counts instead of
    // hash-matching items: every token with tf > n/(k+1) is present
    // (coverage), no estimate exceeds its true count (underestimate),
    // and no undercount exceeds n/(k+1) (bounded error). Each is a
    // theorem, not a tuning property — a verdict flip means the
    // sketch is WRONG, so the 0/1 columns hash-match a literal-1
    // oracle; n_heavy (how many tokens clear the threshold) is exact
    // arithmetic both engines compute independently.
    "q_vocab_heavy_approx" -> Q(
      """WITH toks AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS tok
            FROM documents),
           tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
           n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks)
         SELECT CAST((SELECT count(*) FROM tf, n WHERE tf > n / 201.0) AS BIGINT) AS n_heavy,
                CAST(1 AS INT) AS coverage_ok,
                CAST(1 AS INT) AS under_ok,
                CAST(1 AS INT) AS error_ok""") { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val kHH = 200
      val toks = toksFrame(s, d).select(explode(col("toks")).as("tok"))
      // one-row sketch result (<= k entries), materialized once so
      // the two verdict consumers don't re-run the aggregate
      val sketch = toks.agg(expr(s"heavy_hitters(tok, $kHH)").as("hh"))
        .localCheckpoint(false)
        .select(explode(col("hh")).as("h"))
        .select(col("h.tok").as("tok"), col("h.est").as("est"))
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      val n = toks.count()
      val thr = n.toDouble / (kHH + 1)
      val heavy = exact.filter(col("tf") > thr)
      val missed = heavy.join(broadcast(sketch), Seq("tok"), "left_anti")
      val bounds = exact.join(broadcast(sketch), Seq("tok"))
      heavy.agg(count(lit(1)).as("n_heavy"))
        .crossJoin(missed.agg(
          when(count(lit(1)) === 0, 1).otherwise(0).cast("int").as("coverage_ok")))
        .crossJoin(bounds.agg(
          when(max(col("est") - col("tf")) <= 0, 1).otherwise(0).cast("int").as("under_ok"),
          when(max(col("tf") - col("est")) <= thr, 1).otherwise(0).cast("int").as("error_ok")))
        .select(col("n_heavy"), col("coverage_ok"), col("under_ok"), col("error_ok"))
    },

    // ---- per-document TF-IDF keywords --------------------------------------
    // Keyword extraction: tf·ln(N/df) per (doc, term), top 3 per doc.
    // Scores are rounded to 6 decimals on BOTH sides BEFORE ranking —
    // Java's Math.log and libm's std::log are each <1 ulp but not
    // guaranteed bit-identical, and rounding first also merges
    // analytic ties (2·ln10 = ln100) so the term tie-break decides
    // identically in both engines. df comes from a count window OVER
    // the (doc,term) aggregate — not a self-join, which would compute
    // the tf aggregate twice and shuffle both copies. Three keyed
    // exchanges total ((doc,term) agg → by-term window → per-doc
    // window); every intermediate is vocabulary- or corpus-row-sized,
    // never pairs.
    "q_tfidf_topterms" -> Q(
      """WITH toks AS (SELECT doc_id,
              unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS tok
            FROM documents),
           tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
           dfs AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
           n AS (SELECT count(*) AS n FROM documents),
           ranked AS (
             SELECT tf.doc_id, tf.tok,
                    round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfs.df), 6) AS tfidf,
                    row_number() OVER (PARTITION BY tf.doc_id
                        ORDER BY round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfs.df), 6) DESC,
                                 tf.tok) AS rank
             FROM tf JOIN dfs ON tf.tok = dfs.tok CROSS JOIN n)
         SELECT doc_id, rank, tok, tfidf
         FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""") { (s, d) =>
      val n = nDocs(s, d)
      val tf = toksFrame(s, d)
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
      tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
        .withColumn("tfidf", round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
        .withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("tok"), col("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    },

    // ---- BM25 retrieval ----------------------------------------------------
    // Okapi BM25 top-k retrieval (k1=1.2, b=0.75): 8 fixed query docs
    // (their first 6 tokens are the query terms) ranked against the
    // whole corpus — the retrieval step of retrieval-based data
    // selection and decontamination audits. Cross-engine float
    // discipline: per-term idf rounds ONCE to integer micro-nats
    // (the q_lm_perplexity trick), the tf-saturation factor is a
    // ratio of EXACT integers (k1/b cleared through x20:
    // tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) == 44*tf*S / (20*tf*S +
    // 6*S + 18*N*dl) with S = total tokens, N = docs) rounded once to
    // micro units, and the per-(query,doc) score is an exact integer
    // sum of micro-products — order-independent, so Spark's partial
    // aggregation hash-matches DuckDB's fold.
    // Scale shape: query terms and their df are broadcast (≤48 rows);
    // the corpus-side probe is ONE map-side broadcast join over the
    // (doc, token) tf frame; top-5 per query uses the bounded-heap
    // topk_struct aggregate, never a per-query window sort — at
    // 100 TB each partition ships 5 rows per query, and no shuffle
    // moves more than the matching (doc, query-term) pairs.
    "q_bm25_topk" -> Q(
      """WITH toks AS MATERIALIZED (SELECT doc_id,
              list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
            FROM documents),
         tfc AS MATERIALIZED (SELECT doc_id, dl, tok, count(*) AS tf FROM (
                   SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS tok
                   FROM toks)
                 GROUP BY doc_id, dl, tok),
         n AS (SELECT count(*) AS n FROM documents),
         s AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS s FROM toks),
         qt AS (SELECT DISTINCT qid, tok FROM (
                  SELECT doc_id AS qid, unnest(toks[1:6]) AS tok FROM toks
                  WHERE doc_id IN (7, 61, 113, 167, 229, 283, 337, 401))),
         dfq AS (SELECT tok, count(*) AS df FROM tfc
                 WHERE tok IN (SELECT tok FROM qt) GROUP BY tok),
         cand AS (SELECT q.qid, t.doc_id,
                    CAST(sum(
                      CAST(round(ln((n.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * 1000000) AS BIGINT)
                      * CAST(round(1000000.0 * (44.0 * t.tf * s.s)
                          / (20.0 * t.tf * s.s + 6.0 * s.s + 18.0 * n.n * t.dl)) AS BIGINT)
                    ) AS BIGINT) AS score_fp
                  FROM tfc t JOIN qt q ON t.tok = q.tok
                       JOIN dfq d ON t.tok = d.tok
                       CROSS JOIN n CROSS JOIN s
                  WHERE t.doc_id != q.qid
                  GROUP BY q.qid, t.doc_id),
         ranked AS (SELECT qid, doc_id, score_fp,
                      row_number() OVER (PARTITION BY qid
                          ORDER BY score_fp DESC, doc_id) AS rank
                    FROM cand)
         SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score_fp,
                CAST(score_fp AS DOUBLE) / 1e12 AS score
         FROM ranked WHERE rank <= 5 ORDER BY qid, rank""") { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val qids = Seq(7L, 61L, 113L, 167L, 229L, 283L, 337L, 401L)
      val n = nDocs(s, d)
      val toks = toksFrame(s, d)
      val sTot = corpusTokens(s, d)
      val tfc = memoized(s, s"bm25tf:$d") {
        toks.select(col("doc_id"), size(col("toks")).cast("bigint").as("dl"),
            explode(col("toks")).as("tok"))
          .groupBy(col("doc_id"), col("dl"), col("tok"))
          .agg(count(lit(1)).as("tf"))
      }
      val qt = toks.filter(col("doc_id").isin(qids: _*))
        .select(col("doc_id").as("qid"), explode(slice(col("toks"), 1, 6)).as("tok"))
        .distinct()
      val dfq = tfc.join(broadcast(qt.select(col("tok")).distinct()), "tok")
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val cand = tfc
        .join(broadcast(qt), "tok")
        .filter(col("doc_id") =!= col("qid"))
        .join(broadcast(dfq), "tok")
        .withColumn("idf_micro", expr(
          s"CAST(round(ln(($n.0 - df + 0.5) / (df + 0.5) + 1.0) * 1000000) AS BIGINT)"))
        .withColumn("tfsat_micro", expr(
          s"""CAST(round(1000000.0 * (44.0 * tf * ${sTot}L)
                / (20.0 * tf * ${sTot}L + 6.0 * ${sTot}L + 18.0 * ${n}L * dl)) AS BIGINT)"""))
        .groupBy(col("qid"), col("doc_id"))
        .agg(sum(expr("idf_micro * tfsat_micro")).cast("bigint").as("score_fp"))
      cand.groupBy(col("qid"))
        .agg(expr("topk_struct(struct(-score_fp AS s1, doc_id AS s2), 5)").as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("pos", "r")))
        .selectExpr("qid", "CAST(pos + 1 AS BIGINT) AS rank", "r.s2 AS doc_id",
          "CAST(-r.s1 AS BIGINT) AS score_fp",
          "CAST(CAST(-r.s1 AS BIGINT) AS DOUBLE) / 1e12 AS score")
        .orderBy(col("qid"), col("rank"))
    },

    // ---- sequence packing ---------------------------------------------------
    // Assign documents to fixed-token-budget training sequences: the
    // running token count within each source stream determines which
    // sequence a doc starts in (floor(preceding-cum / budget)). The
    // window is PARTITIONED by source — packing parallelizes across
    // sources and never needs a global order, which is what makes it
    // viable at corpus scale (a single global cumsum would serialize).
    "q_pack_sequences" -> Q(
      """SELECT doc_id, source, n_tokens,
                CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS seq_id
         FROM (SELECT doc_id, source, n_tokens,
                      sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
               FROM (SELECT doc_id, source,
                       CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS BIGINT) AS n_tokens
                     FROM documents))
         ORDER BY doc_id""") { (s, d) =>
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      t(s, d, "documents")
        .selectExpr("doc_id", "source",
          "CAST(size(filter(split(text, '\\\\s+'), x -> x != '')) AS BIGINT) AS n_tokens")
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          floor((col("cum") - col("n_tokens")) / 512).cast("bigint").as("seq_id"))
        .orderBy(col("doc_id"))
    },

    // ---- sliding-window token chunking --------------------------------------
    // Context-window preparation: each document is cut into 128-token
    // chunks at stride 64 (half-overlap) — the standard long-document
    // treatment before tokenized training or embedding indexing. Pure
    // map-side explode: chunk starts come from a codegen'd stepped
    // sequence, the chunk hash is md5 of the joined tokens (engine-
    // independent, so the whole op is oracle-exact). At 100 TB this is
    // a scan-shaped operator — no shuffle, output rows ≈ 2x corpus
    // token mass / 128.
    "q_chunk_windows" -> Q(
      """WITH docs AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
           FROM documents),
         ch AS (SELECT doc_id,
                  [{'cid': CAST(i // 64 AS BIGINT), 'st': CAST(i AS BIGINT),
                    'nt': CAST(least(128, len(toks) - i) AS BIGINT),
                    'h': md5(array_to_string(toks[i+1 : i+128], ' '))}
                   for i in range(0, len(toks), 64)] AS cs
                FROM docs WHERE len(toks) > 0)
         SELECT doc_id, u.cid AS chunk_id, u.st AS chunk_start,
                u.nt AS n_chunk_tokens, u.h AS chunk_hash
         FROM (SELECT doc_id, unnest(cs) AS u FROM ch)
         ORDER BY doc_id, chunk_id""") { (s, d) =>
      toksFrame(s, d)
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("toks"),
          posexplode(expr("sequence(0, size(toks) - 1, 64)")).as(Seq("chunk_id", "st")))
        .selectExpr("doc_id",
          "CAST(chunk_id AS BIGINT) AS chunk_id",
          "CAST(st AS BIGINT) AS chunk_start",
          "CAST(least(128, size(toks) - st) AS BIGINT) AS n_chunk_tokens",
          "md5(concat_ws(' ', slice(toks, st + 1, 128))) AS chunk_hash")
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // ---- deterministic global shuffle, 100 TB form --------------------------
    // Training-order shuffling: a reproducible global permutation by
    // md5(doc_id). A naive row_number() OVER (ORDER BY hash) is a
    // SINGLE-PARTITION global sort — the same disease as
    // q_window_ntile. Scale form: the first FOUR hex chars bucket
    // rows into 65536 ordered ranges (hex-prefix order IS md5-string
    // order; ~1.5 GB/bucket at 100 TB — widen the prefix if corpora
    // outgrow that), ranks are assigned per bucket in parallel, and
    // the per-bucket counts (≤64k rows, ~1 MB) prefix-sum into
    // offsets broadcast back — global rank = bucket offset + local
    // rank, identical to the naive form, which is exactly what the
    // DuckDB oracle computes.
    "q_shuffle_bucketed" -> Q(
      """SELECT doc_id,
                row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS shuffle_rank
         FROM documents ORDER BY shuffle_rank""") { (s, d) =>
      val keyed = t(s, d, "documents")
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("sk"))
        .withColumn("bkt", expr("CAST(conv(substring(sk, 1, 4), 16, 10) AS INT)"))
      val wLocal = Window.partitionBy(col("bkt")).orderBy(col("sk"), col("doc_id"))
      val local = keyed.withColumn("lrank", row_number().over(wLocal))
      val offsets = keyed.groupBy(col("bkt")).agg(count(lit(1)).as("bn"))
        .withColumn("off", coalesce(sum(col("bn")).over(
          Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("bkt"), col("off"))
      local.join(broadcast(offsets), Seq("bkt"))
        .select(col("doc_id"), (col("off") + col("lrank")).cast("bigint").as("shuffle_rank"))
        .orderBy(col("shuffle_rank"))
    },

    // ---- sequence packing, 100 TB form: two-phase hierarchical cumsum -------
    // q_pack_sequences windows PARTITION BY source — with tens of
    // sources, parallelism caps at |sources| and each partition is a
    // full per-source sort (the q_window_ntile disease). The scale
    // form is the classic hierarchical prefix sum: (1) local cumsum
    // within (source, doc_id-bucket) — parallelism scales with the
    // corpus; (2) per-bucket totals (a tiny aggregate) prefix-summed
    // per source over |buckets| rows; (3) bucket offsets broadcast
    // back and added map-side. The OUTPUT IS IDENTICAL to
    // q_pack_sequences, so the same DuckDB oracle gates both — the
    // declared pair is correctness twin + scale twin, like
    // q_topk_per_group / q_topk_agg.
    "q_pack_bucketed" -> Q(
      """SELECT doc_id, source, n_tokens,
                CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS seq_id
         FROM (SELECT doc_id, source, n_tokens,
                      sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
               FROM (SELECT doc_id, source,
                       CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS BIGINT) AS n_tokens
                     FROM documents))
         ORDER BY doc_id""") { (s, d) =>
      val base = t(s, d, "documents")
        .selectExpr("doc_id", "source",
          "CAST(size(filter(split(text, '\\\\s+'), x -> x != '')) AS BIGINT) AS n_tokens",
          "CAST(doc_id DIV 500 AS BIGINT) AS bkt")
      val wLocal = Window.partitionBy(col("source"), col("bkt")).orderBy(col("doc_id"))
      val local = base.withColumn("lcum", sum(col("n_tokens")).over(wLocal))
      // bucket totals: |sources|x|buckets| rows — the only global
      // window runs over THIS aggregate, not the corpus
      val offsets = base.groupBy(col("source"), col("bkt"))
        .agg(sum(col("n_tokens")).as("btot"))
        .withColumn("off", coalesce(sum(col("btot")).over(
          Window.partitionBy(col("source")).orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("source"), col("bkt"), col("off"))
      local.join(broadcast(offsets), Seq("source", "bkt"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          floor((col("lcum") + col("off") - col("n_tokens")) / 512)
            .cast("bigint").as("seq_id"))
        .orderBy(col("doc_id"))
    },

    // ---- PII-style masking --------------------------------------------------
    // Curation normalization: digit runs and email-shaped tokens are
    // replaced with placeholder tags. Since r18 the Spark side runs
    // the fused mask_pii kernel — ONE codegen'd byte scan instead of
    // two java.util.regex passes (the adjudicated 4.6×-at-10×
    // scaler); byte-exact to the two-pass composition (exactness
    // argument at TextKernels.maskPii, parity gated in
    // FunctionsSpec), so the regex-form DuckDB oracle is unchanged.
    // Map-only, codegen'd.
    "q_text_mask" -> Q(
      """SELECT doc_id,
                regexp_replace(
                  regexp_replace(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
                  '[0-9]+', '<NUM>', 'g') AS masked
         FROM documents ORDER BY doc_id""") { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      t(s, d, "documents")
        .selectExpr("doc_id", "mask_pii(text) AS masked")
        .orderBy(col("doc_id"))
    },

    // ---- unicode normalization (NFC, oracle-checked) -----------------------
    // Composed vs decomposed forms of the same glyph defeat exact
    // dedup, token counting, and fingerprints, so NFC normalization is
    // the standard first curation step. The corpus is all-ASCII (a
    // vacuous oracle on raw text), so each doc is suffixed with a
    // PLANTED variant — composed/decomposed pairs, combining marks,
    // NFC-invariant ligatures — chosen by doc_id arithmetic that both
    // engines reproduce; the DuckDB oracle then hash-matches our
    // codegen'd nfc_normalize kernel (graft.functions.NfcNormalize,
    // the JDK's UAX #15 reference impl) against DuckDB's utf8proc one
    // on every row: normalized string, code-point lengths both sides,
    // and a changed-bit. Derivation-at-query-time survives GenScale
    // unchanged (variants key off doc_id, which scaling remaps
    // deterministically). Map-only, one scan, zero shuffles.
    "q_text_unicode_norm" -> Q(
      s"""WITH v AS (SELECT [${TextOps.unicodeVariants.map(x => s"'${x.replace("'", "''")}'").mkString(", ")}] AS vs),
              r AS (SELECT doc_id,
                           substr(text, 1, 24) || ' ' || vs[CAST(doc_id % 8 AS INT) + 1] AS raw
                    FROM documents, v)
         SELECT doc_id,
                nfc_normalize(raw) AS nfc,
                CAST(length(raw) AS BIGINT) AS len_raw,
                CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
                CAST(CASE WHEN nfc_normalize(raw) = raw THEN 0 ELSE 1 END AS INT) AS changed
         FROM r ORDER BY doc_id""") { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      t(s, d, "documents")
        .withColumn("raw", concat(substring(col("text"), 1, 24), lit(" "),
          element_at(typedlit(TextOps.unicodeVariants),
            (pmod(col("doc_id"), lit(8)) + 1).cast("int"))))
        .selectExpr("doc_id",
          "nfc_normalize(raw) AS nfc",
          "CAST(length(raw) AS BIGINT) AS len_raw",
          "CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc",
          "CAST(CASE WHEN nfc_normalize(raw) = raw THEN 0 ELSE 1 END AS INT) AS changed")
        .orderBy(col("doc_id"))
    },

    // ---- benchmark decontamination -----------------------------------------
    // Flag training documents sharing any word-8-gram with the eval
    // set (GPT-3/PaLM-style n-gram decontamination; 8 tokens stands in
    // for the usual 13 because the synthetic docs are short). The eval
    // set here is the doc_id % 50 == 0 slice — in production it is an
    // external benchmark suite, which is exactly why the eval-gram set
    // is BROADCAST: benchmarks are bounded (thousands of docs) while
    // the training corpus is the 100 TB side, so contamination checking
    // is one map-side semi-join + a partial-aggregated count, never a
    // corpus-vs-corpus shuffle. The 8-grams come from the shared
    // gramRows builder (codegen lead() windows, no array lambdas).
    "q_decontaminate" -> Q(
      s"""WITH $gram8Cte
         SELECT i.doc_id, count(*) AS n_shared
         FROM inv i JOIN eval_g USING (g)
         WHERE i.doc_id % 50 <> 0
         GROUP BY 1 ORDER BY 1""") { (s, d) =>
      contaminationHits(s, d)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
        .orderBy(col("doc_id"))
    },

    // ---- bloom-filter decontamination (the 100 TB twin) ---------------------
    // q_decontaminate broadcasts the EXACT eval-gram set; that is the
    // right plan while benchmarks stay thousands of docs, but a 100 TB
    // shop decontaminating against a large held-out corpus broadcasts
    // a BLOOM FILTER instead: fixed bytes regardless of gram count,
    // still probed map-side with zero shuffle on the training side.
    // This twin builds the filter with Spark's own runtime-filter
    // sketch (bloom_agg — a partial-aggregable BloomFilterAggregate,
    // so partitions build partial filters that OR-merge) sized for
    // fpp ≈ 1e-6 at the observed eval-gram cardinality, then probes
    // it as a scalar subquery (bloom_contains), exactly how Spark
    // injects runtime group-join filters. Sketch membership is
    // engine-specific, so the gate verifies the two PROVABLE
    // properties against the exact relation: a bloom filter has NO
    // false negatives (every exactly-contaminated doc must be
    // flagged — recall_ok is a theorem, not a tolerance) and its
    // false-positive mass at fpp 1e-6 over ≤ millions of probes is
    // bounded (fp_ok allows 1% of training docs, ~10⁴× the expected
    // count); n_contam_exact is exact arithmetic both engines compute
    // independently.
    "q_decontam_bloom" -> Q(
      s"""WITH $gram8Cte
         SELECT CAST((SELECT count(DISTINCT i.doc_id) FROM inv i JOIN eval_g USING (g)
                      WHERE i.doc_id % 50 <> 0) AS BIGINT) AS n_contam_exact,
                CAST(1 AS INT) AS recall_ok,
                CAST(1 AS INT) AS fp_ok""") { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val grams = gram8Rows(s, d)
      grams.filter(col("doc_id") % 50 === 0)
        .select(xxhash64(col("g")).as("h"))
        .createOrReplaceTempView("graft_bloom_eval")
      grams.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), xxhash64(col("g")).as("h"))
        .createOrReplaceTempView("graft_bloom_train")
      // size from the measured eval cardinality (the memoized gram
      // frame makes this count cheap), inside Spark's runtime-filter
      // caps (4M items / 64M bits); 29 bits/item ≈ fpp 1e-6
      val nEval = s.table("graft_bloom_eval").count()
      val (estItems, numBits) = QualityRule.bloomSizing(nEval)
      val flagged = s.sql(
        s"""SELECT DISTINCT doc_id FROM graft_bloom_train
            WHERE bloom_contains(
              (SELECT bloom_agg(h, ${estItems}L, ${numBits}L) FROM graft_bloom_eval), h)""")
        .localCheckpoint(false)
      // lazy-checkpointed: the final statement reads exactIds TWICE
      // (the exact count and the recall anti-join) — without the
      // boundary each reference re-runs the hits join + distinct
      // exchange inside one action (guide §2.4: don't repeat a shuffle
      // whose output you already have)
      val exactIds = contaminationHits(s, d).select(col("doc_id")).distinct()
        .localCheckpoint(false)
      val nTrainDocs = nDocs(s, d) - (nDocs(s, d) + 49) / 50
      exactIds.agg(count(lit(1)).cast("bigint").as("n_contam_exact"))
        .crossJoin(exactIds.join(broadcast(flagged), Seq("doc_id"), "left_anti")
          .agg(when(count(lit(1)) === 0, 1).otherwise(0).cast("int").as("recall_ok")))
        .crossJoin(flagged.agg(count(lit(1)).as("n_flagged")))
        .select(col("n_contam_exact"), col("recall_ok"),
          when(col("n_flagged") - col("n_contam_exact") <=
            math.max(1L, nTrainDocs / 100L), 1).otherwise(0).cast("int").as("fp_ok"))
    },

    // ---- eval-leak span excision (span-level decontamination) ---------------
    // q_decontaminate FLAGS whole training documents sharing any
    // 8-gram with the eval slice; dropping a whole doc for one quoted
    // sentence over-deletes. This emits the exact leaked SPANS in
    // TRAINING docs — maximal runs (>= 16 tokens) whose every 8-gram
    // occurs in some eval doc — the input for surgical excision via
    // the q_dedup_spans_apply machinery instead of doc-level drops.
    // Scale shape: the eval membership mark is a window max over the
    // same one by-gram exchange the dup-span detector uses (no join
    // against a gram set; the eval side rides the same shuffle), then
    // the shared gaps-and-islands merge. Train-side filter runs
    // before the by-doc window, so eval rows never enter it.
    "q_decontam_spans" -> Q(
      s"""WITH $gramPosCte,
          evalg AS (SELECT DISTINCT g FROM g8 WHERE doc_id % 50 = 0),
          isl AS (SELECT doc_id, pos,
                    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
                  FROM g8 WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM evalg))
          SELECT doc_id, min(pos) AS span_start, max(pos) - min(pos) + 8 AS span_len
          FROM isl GROUP BY doc_id, island
          HAVING max(pos) - min(pos) + 8 >= 16
          ORDER BY doc_id, span_start""") { (s, d) =>
      val wg = Window.partitionBy(col("g"))
      islandSpans(gramRows(s, d, 8)
        .withColumn("in_eval",
          max(when(col("doc_id") % 50 === 0, 1).otherwise(0)).over(wg))
        .filter(col("in_eval") === 1 && col("doc_id") % 50 =!= 0))
        .orderBy(col("doc_id"), col("span_start"))
    },

    // ---- training-mixture construction (weighted up/down-sampling) ----------
    // Given target mixture weights per source, emit each document
    // 0..n times so the output corpus matches the mixture: weight
    // 0.25 keeps a quarter of the source, 2.5 repeats every doc
    // twice and half of them a third time. The fractional part is
    // resolved by a DETERMINISTIC per-doc uniform — pure integer
    // arithmetic (Knuth multiplicative hash mod 1e6) both engines
    // reproduce exactly, so the oracle hash-matches every emitted
    // copy, not just aggregate rates. Shape at 100 TB: map-only
    // fan-out (weights are a broadcast-sized map, here an arithmetic
    // derivation), zero shuffles — the explode is the plan, there is
    // nothing to optimize away.
    "q_mix_weighted" -> Q(
      """WITH w AS (SELECT doc_id, source,
                      CAST(substr(source, 4) AS INT) % 4 AS wi,
                      ((doc_id % 1000000) * 435761 + 12345) % 1000000 AS r
                    FROM documents),
            c AS (SELECT doc_id, source,
                    [0,0,1,2][wi+1] +
                    CASE WHEN r < [250000,500000,0,500000][wi+1] THEN 1 ELSE 0 END AS n_copies
                  FROM w)
         SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS INT) AS copy_idx
         FROM c
         ORDER BY doc_id, copy_idx""") { (s, d) =>
      mixCopies(t(s, d, "documents").select(col("doc_id"), col("source")))
        .orderBy(col("doc_id"), col("copy_idx"))
    },

    // ---- temperature-scaled mixture -----------------------------------------
    // The published alternative to hand-set weights (multilingual
    // pretraining practice: sample source i ∝ mass_i^α, α = 0.5):
    // temperature α < 1 flattens the source distribution — small
    // sources upsample, dominant ones downsample — while keeping the
    // total output mass ≈ the corpus. Per-source char mass m_i scales
    // to a_i = round(1e6·√m_i) ONCE (the micro-integer discipline:
    // the only cross-engine float op is one sqrt on an exact integer,
    // rounded immediately), the normalizer Σa_i is then an exact
    // integer sum, and the per-source copy rate (a_i/Σa)·(T/m_i)
    // rounds once to micro units. The fractional copy resolves by
    // the SAME deterministic per-doc hash as q_mix_weighted, so
    // every emitted copy hash-matches.
    // Shape at 100 TB: one source-sized aggregate, the rate table
    // broadcasts back, and the fan-out is map-only — zero windows,
    // zero keyed shuffles of the corpus.
    "q_mix_temperature" -> Q(
      """WITH m AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS mass
                    FROM documents GROUP BY source),
            a AS (SELECT source, mass,
                    CAST(round(1000000 * sqrt(CAST(mass AS DOUBLE))) AS BIGINT) AS am
                  FROM m),
            tot AS (SELECT CAST(sum(mass) AS BIGINT) AS t,
                           CAST(sum(am) AS BIGINT) AS asum FROM a),
            r AS (SELECT a.source,
                    CAST(round(1000000.0 * CAST(a.am AS DOUBLE) * tot.t
                         / (CAST(tot.asum AS DOUBLE) * a.mass)) AS BIGINT) AS rate_micro
                  FROM a CROSS JOIN tot),
            c AS (SELECT d.doc_id, d.source, r.rate_micro,
                    CAST(r.rate_micro // 1000000 AS INT) +
                    CASE WHEN ((d.doc_id % 1000000) * 435761 + 12345) % 1000000
                              < r.rate_micro % 1000000 THEN 1 ELSE 0 END AS n_copies
                  FROM documents d JOIN r ON d.source = r.source)
         SELECT doc_id, source, rate_micro,
                CAST(unnest(generate_series(1, n_copies)) AS INT) AS copy_idx
         FROM c WHERE n_copies > 0
         ORDER BY doc_id, copy_idx""") { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val m = docs.groupBy(col("source"))
        .agg(sum(col("n_chars")).cast("bigint").as("mass"))
        .withColumn("am",
          expr("CAST(round(1000000 * sqrt(CAST(mass AS DOUBLE))) AS BIGINT)"))
      val tot = m.agg(sum(col("mass")).cast("bigint").as("t"),
        sum(col("am")).cast("bigint").as("asum"))
      val r = m.crossJoin(broadcast(tot))
        .selectExpr("source",
          """CAST(round(1000000.0 * CAST(am AS DOUBLE) * t
               / (CAST(asum AS DOUBLE) * mass)) AS BIGINT) AS rate_micro""")
      docs.join(broadcast(r), "source")
        .withColumn("rh",
          pmod(pmod(col("doc_id"), lit(1000000L)) * lit(435761L) + lit(12345L),
            lit(1000000L)))
        .withColumn("n_copies", expr(
          """CAST(rate_micro DIV 1000000 AS INT) +
             CASE WHEN rh < rate_micro % 1000000 THEN 1 ELSE 0 END"""))
        .filter(col("n_copies") > 0)
        .withColumn("copy_idx", explode(sequence(lit(1), col("n_copies"))))
        .select(col("doc_id"), col("source"), col("rate_micro"), col("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx"))
    },

    // ---- token-budget corpus selection --------------------------------------
    // Data selection under a token budget: per source, keep the
    // highest-quality documents whose cumulative token count fits
    // half the source's tokens. Quality is an integer-arithmetic
    // proxy ((n_chars*1000) div n_tokens — mean word length in
    // milli-chars) so ranking is bit-identical across engines; ties
    // break on doc_id. This exact form is the oracle-parity variant:
    // its per-source ordered window is the same low-cardinality skew
    // the ntile/packing naive forms carry (|sources| partitions bound
    // parallelism). The scale twin below replaces the sort+cumsum
    // with one sketch pass.
    "q_select_budget" -> Q(
      """WITH tk AS (SELECT doc_id, source, n_chars,
                       len(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS n_tokens
                     FROM documents),
            sc AS (SELECT doc_id, source, n_tokens,
                     (n_chars * 1000) // n_tokens AS score
                   FROM tk WHERE n_tokens > 0),
            b AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) // 2 AS budget FROM sc GROUP BY 1),
            w AS (SELECT doc_id, source, n_tokens, score,
                    sum(n_tokens) OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS cum
                  FROM sc)
         SELECT w.doc_id, w.source, CAST(w.n_tokens AS BIGINT) AS n_tokens,
                CAST(w.cum AS BIGINT) AS cum_tokens
         FROM w JOIN b USING (source) WHERE w.cum <= b.budget
         ORDER BY source, doc_id""") { (s, d) =>
      val sc = selectionScores(s, d)
      val budgets = sc.groupBy(col("source"))
        .agg(expr("sum(n_tokens) div 2").as("budget"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("score").desc, col("doc_id"))
      sc.withColumn("cum", sum(col("n_tokens")).over(w))
        .join(broadcast(budgets), Seq("source"))
        .filter(col("cum") <= col("budget"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum").as("cum_tokens"))
        .orderBy(col("source"), col("doc_id"))
    },

    // ---- token-budget selection, sketch-threshold twin ----------------------
    // The 100 TB form of budget selection: nobody sorts a source's
    // documents globally — you pick a QUALITY THRESHOLD from a
    // distribution sketch and keep everything above it. One
    // partial-aggregable approx_percentile pass finds each source's
    // median score; the keep-decision is then a map-side filter (no
    // window, no per-source sort, no skew). The threshold overshoots
    // the budget by at most one score class, so the gate verifies the
    // selection semantics rather than hash-matching the kept set:
    // per source, selected tokens land in a [35%, 65%] band of the
    // source's total (0/1 verdict vs a literal-1 oracle — the sketch
    // at default accuracy is near-exact, the band absorbs score-class
    // granularity), and the selection is non-empty.
    "q_select_threshold_approx" -> Q(
      """SELECT source, CAST(1 AS INT) AS band_ok, CAST(1 AS INT) AS nonempty_ok
         FROM (SELECT DISTINCT source FROM documents)
         ORDER BY source""") { (s, d) =>
      val sc = selectionScores(s, d)
      val cuts = sc.groupBy(col("source"))
        .agg(expr("approx_percentile(score, 0.5)").as("cut"),
          sum(col("n_tokens")).as("total"))
      sc.join(broadcast(cuts), Seq("source"))
        .groupBy(col("source"), col("total"))
        .agg(sum(when(col("score") >= col("cut"), col("n_tokens"))
          .otherwise(lit(0L))).as("kept"))
        .select(col("source"),
          when(col("kept") * 100 >= col("total") * 35 &&
               col("kept") * 100 <= col("total") * 65, 1)
            .otherwise(0).cast("int").as("band_ok"),
          when(col("kept") > 0, 1).otherwise(0).cast("int").as("nonempty_ok"))
        .orderBy(col("source"))
    },

    // ---- curation funnel: the capstone pipeline in ONE plan -----------------
    // What a training-data run actually executes: exact-dedup keep-list
    // ∘ minimum-quality filter ∘ benchmark decontamination, composed as
    // a single declarative plan Catalyst optimizes end-to-end. Shapes
    // at scale: the keep-list is one md5-keyed partial aggregate; the
    // eval-gram set is broadcast (benchmarks are bounded); the
    // contaminated-id set is an anti-join probe sized by contamination,
    // not the corpus; the quality filter is map-side. Nothing here is
    // pairwise or corpus²-sized — the funnel costs two keyed exchanges
    // plus broadcast probes no matter how many TB flow through it.
    "q_pipeline_curate" -> Q(
      s"""WITH $gram8Cte,
          keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
          contaminated AS (SELECT DISTINCT i.doc_id FROM inv i JOIN eval_g USING (g)
                           WHERE i.doc_id % 50 <> 0),
          toks AS (SELECT doc_id,
                     len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')) AS n_tokens
                   FROM documents)
          SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens
          FROM toks t JOIN keepers k ON t.doc_id = k.doc_id
          WHERE t.doc_id % 50 <> 0
            AND t.n_tokens >= 5
            AND t.doc_id NOT IN (SELECT doc_id FROM contaminated)
          ORDER BY t.doc_id""") { (s, d) =>
      val keepers = t(s, d, "documents")
        .groupBy(md5(col("text"))).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val contaminated = contaminationHits(s, d).select(col("doc_id")).distinct()
      toksFrame(s, d)
        .select(col("doc_id"), size(col("toks")).cast("bigint").as("n_tokens"))
        .filter(col("doc_id") % 50 =!= 0 && col("n_tokens") >= 5)
        .join(keepers, Seq("doc_id"))
        .join(contaminated, Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
    },

    // ---- per-source boilerplate detection -----------------------------------
    // C4-style boilerplate: a 3-gram present in > 25% of its source's
    // documents is template text (headers, footers, nav chrome); each
    // doc reports how much of it is boilerplate. Shape at scale: the
    // gram-level df is one partial-aggregated shuffle keyed (source,
    // gram); per-source doc counts are an aggregate bounded by
    // |sources| (broadcast); the boilerplate dictionary join is left
    // to AQE — template sets are usually broadcastable but nothing
    // requires it. The integer `df * 4 > nd` threshold avoids float
    // comparison drift between engines.
    "q_text_boilerplate" -> Q(
      s"""$ngCte,
          inv AS (SELECT doc_id, source, unnest(ng) AS sh FROM docs),
          src_docs AS (SELECT source, count(*) AS nd FROM documents GROUP BY 1),
          gram_df AS (SELECT source, sh, count(*) AS df FROM inv GROUP BY 1, 2),
          boiler AS (SELECT g.source, g.sh FROM gram_df g JOIN src_docs s USING (source)
                     WHERE g.df * 4 > s.nd)
          SELECT i.doc_id, count(*) AS n_grams, count(b.sh) AS n_boiler,
                 CAST(count(b.sh) AS DOUBLE) / count(*) AS boiler_frac
          FROM inv i LEFT JOIN boiler b ON i.source = b.source AND i.sh = b.sh
          GROUP BY 1 ORDER BY 1""") { (s, d) =>
      // (doc_id, source) is a 2-column pruned scan; the join keys the
      // memoized gram frame by doc_id — both sides hash-partition, no
      // corpus-width rows move
      val inv = shingleRows(s, d)
        .join(t(s, d, "documents").select(col("doc_id"), col("source")), Seq("doc_id"))
      val srcDocs = t(s, d, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("nd"))
      val boiler = inv.groupBy(col("source"), col("sh")).agg(count(lit(1)).as("df"))
        .join(broadcast(srcDocs), Seq("source"))
        .filter(col("df") * 4 > col("nd"))
        .select(col("source"), col("sh"), lit(1).as("b"))
      inv.join(boiler, Seq("source", "sh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), count(col("b")).as("n_boiler"),
          (count(col("b")).cast("double") / count(lit(1))).as("boiler_frac"))
        .orderBy(col("doc_id"))
    },

    // ---- intra-document repetition stats -------------------------------------
    // Gopher-style repetition signals: token count, distinct-token
    // count, and the most-frequent-token share — high top_frac marks
    // degenerate/spammy text. Two partial-aggregated shuffles, both
    // keyed by doc_id (the second collapses into the first's
    // partitioning), nothing corpus-wide.
    "q_text_repetition" -> Q(
      """WITH tok AS (SELECT doc_id,
                        unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS tok
                      FROM documents),
          cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2)
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks, count(*) AS n_distinct,
                 max(c) AS top_cnt,
                 CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_frac
          FROM cnt GROUP BY 1 ORDER BY 1""") { (s, d) =>
      toksFrame(s, d)
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_toks"), count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_cnt"))
        .select(col("doc_id"), col("n_toks"), col("n_distinct"), col("top_cnt"),
          (col("top_cnt").cast("double") / col("n_toks").cast("double")).as("top_frac"))
        .orderBy(col("doc_id"))
    },

    // ---- token-budget weighted sampling (domain mixing) ----------------------
    // Down-sample each source to a fixed character budget: rate =
    // min(1, budget / source_chars), membership decided by a pure
    // hash of the key (md5 prefix as a 16-bit fraction — Spark's
    // conv() and DuckDB's '0x' cast read the same hex, so acceptance
    // is oracle-exact and reproducible across engines, partitionings,
    // and reruns). This is how mixture weights are applied at corpus
    // scale: per-source rates from one bounded aggregate (broadcast),
    // then a codegen'd map-only filter — no shuffle of the corpus.
    "q_sample_weighted" -> Q(
      """WITH src_rate AS (
           SELECT source,
                  least(CAST(1.0 AS DOUBLE),
                        CAST(2000.0 AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE)) AS rate
           FROM documents GROUP BY 1)
         SELECT d.doc_id, d.source, r.rate
         FROM documents d JOIN src_rate r USING (source)
         WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS BIGINT) / 65536.0 < r.rate
         ORDER BY d.doc_id""") { (s, d) =>
      val rates = t(s, d, "documents").groupBy(col("source"))
        .agg(least(lit(1.0),
          lit(2000.0) / sum(col("n_chars")).cast("double")).as("rate"))
      t(s, d, "documents")
        .join(broadcast(rates), Seq("source"))
        .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("bigint") / lit(65536.0) < col("rate"))
        .select(col("doc_id"), col("source"), col("rate"))
        .orderBy(col("doc_id"))
    },

    // ---- winnowing fingerprint (rolling hash + min-sampling) ---------------
    // MOSS-style document sketch: hash every word-5-gram (the rolling
    // unit), take the minimum hash of each window of 4 consecutive
    // grams, and keep the distinct minima — a position-robust
    // fingerprint whose size is ~|grams|/4. Gram hashing and window
    // minima run in codegen over exploded token rows; only the final
    // per-doc sketch fold (tens of longs) touches array functions.
    // Gram hashes are md5-derived 60-bit ints computed identically in
    // DuckDB (winnowMinima scaladoc) → FULL oracle, not rows-only.
    "q_fingerprint_winnow" -> Q(
      """WITH docs5 AS (
           SELECT doc_id,
             CASE WHEN len(toks) >= 5 THEN
               [{'pos': i, 'gh': CAST(('0x' || substr(md5(
                   toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]
                 ), 1, 15)) AS BIGINT)} for i in range(1, len(toks)-3)]
             ELSE [] END AS gs
           FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
                 FROM documents)),
         g AS (SELECT doc_id, u.pos AS pos, u.gh AS gh
               FROM (SELECT doc_id, unnest(gs) AS u FROM docs5)),
         m AS (SELECT doc_id,
                 min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
                 lead(gh, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS g3
               FROM g)
         SELECT doc_id, count(DISTINCT m) AS sketch_size,
                md5(array_to_string(list_sort(list(DISTINCT m)), ',')) AS sketch_hash
         FROM m WHERE g3 IS NOT NULL
         GROUP BY doc_id ORDER BY doc_id""") { (s, d) =>
      winnowMinima(s, d)
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("m")).as("sketch_size"),
             md5(array_join(array_sort(collect_set(col("m"))), ",")).as("sketch_hash"))
        .orderBy(col("doc_id"))
    },

    // ---- BPE-ish subword token counting -----------------------------------
    // GPT-2-style pre-tokenizer shape: contraction suffixes, space-
    // prefixed letter runs, digit runs, punctuation runs. The pattern
    // uses only syntax Java regex and RE2 interpret identically, so
    // the DuckDB oracle hash-matches exactly.
    "q_text_tokens_bpe" -> Q(
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text,
                  '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS BIGINT)
                  AS n_bpe_tokens
         FROM documents ORDER BY doc_id""") { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          regexp_count(col("text"),
            lit("'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"))
            .cast("bigint").as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    },

    // ---- quality scoring --------------------------------------------------
    // Ratios are IEEE divisions of exact integers — bit-identical across
    // engines, no rounding tolerance needed.
    "q_text_quality" -> Q(
      s"""$qualitySql ORDER BY doc_id""") { (s, d) =>
      qualityFrame(s, d).orderBy(col("doc_id"))
    },

    // ---- hashed-linear quality-classifier application ---------------------
    // The heuristic quality rules above are hand-set thresholds; real
    // curation pipelines APPLY A TRAINED CLASSIFIER (CCNet/GPT-3-style
    // fastText over hashed token features). This is that application
    // shape end to end: hash each token to a feature id, look up its
    // weight, score = mean weight, keep = sign. Weights here are
    // derived deterministically FROM the feature hash (integer range
    // [-1e6, 1e6] scaled to [-1, 1]) as a stand-in for the trained
    // vector — in production the weight table is a broadcast map, and
    // NOTHING else in the plan changes: per-token md5-derived hashing
    // and weighting are map-side, the per-doc mean is one
    // partial-aggregable integer sum (order-independent, so the
    // double score is bit-identical across engines), zero joins. The
    // oracle reproduces weights exactly via the same md5-60bit
    // construction (q_sample_weighted trick).
    "q_quality_model" -> Q(
      s"""WITH $qmodelCteSql
          SELECT doc_id, CAST(sw AS DOUBLE) / (1e6 * n) AS score,
                 CAST(CASE WHEN sw > 0 THEN 1 ELSE 0 END AS INT) AS keep
          FROM qm ORDER BY doc_id""") { (s, d) =>
      qmodelAgg(s, d)
        .selectExpr("doc_id", "CAST(sw AS DOUBLE) / (1e6 * n) AS score",
          "CAST(CASE WHEN sw > 0 THEN 1 ELSE 0 END AS INT) AS keep")
        .orderBy(col("doc_id"))
    },

    // ---- distributed classifier-training step ------------------------------
    // The training half of the quality-classifier family, pairing
    // q_quality_model (apply) the way q_kmeans_update pairs
    // q_dedup_semantic (assign): one full-batch logistic-regression
    // epoch over hashed token features — the CCNet/GPT-3-style
    // fastText recipe (hashing trick, 4096 buckets, the q_dsir_weights
    // bucket construction) with lang='en' as the target-domain label.
    // Start weights are md5-derived integers per BUCKET (the
    // q_quality_model stand-in discipline — a warm-start table is a
    // broadcast map with an identical plan). Exact fixed point
    // throughout (the q_kmeans_update discipline): the margin is an
    // exact integer sum of micro-weights, the per-doc logistic
    // residual y − σ(score) rounds ONCE to integer micro units (σ over
    // the same IEEE double on both engines), and the per-bucket
    // gradient Σ dc·r is an exact partial-aggregable integer sum. The
    // update w_new = w_old + grad/n_docs (gradient ascent on mean
    // log-likelihood, unit rate in micro units) is one IEEE division
    // + add of exact integers — bit-identical across engines.
    //
    // 100 TB shape: one (doc,bucket) partial aggregate, one per-doc
    // reduction, one doc-keyed join of two frames derived from the
    // same persisted aggregate, and a BUCKET-sized (≤4096 rows) final
    // exchange carrying the gradient — the weight table never grows
    // with the corpus, exactly why the hashing trick is the published
    // web-scale recipe. Iterating = re-running this step with the
    // emitted table broadcast back in.
    "q_classifier_train_step" -> Q(
      s"""WITH $classifierCteSql,
         ${classifierWInitCte("wt")},
         pd AS (SELECT d.doc_id, max(d.lang) AS lang,
                  CAST(sum(d.dc * w.w) AS BIGINT) AS sw,
                  CAST(sum(d.dc) AS BIGINT) AS n
                FROM docb d JOIN wt w ON d.b = w.b GROUP BY d.doc_id),
         rs AS (SELECT doc_id,
                  CAST(round(1000000 * ((CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                     - 1.0 / (1.0 + exp(-(CAST(sw AS DOUBLE) / (1e6 * n)))))) AS BIGINT) AS r
                FROM pd),
         g AS (SELECT d.b, CAST(sum(d.dc * r.r) AS BIGINT) AS grad_micro
               FROM docb d JOIN rs r ON d.doc_id = r.doc_id GROUP BY d.b)
         SELECT g.b AS bucket, w.w AS w_old, g.grad_micro,
                w.w + CAST(g.grad_micro AS DOUBLE) / (SELECT count(*) FROM pd) AS w_new
         FROM g JOIN wt w ON g.b = w.b ORDER BY bucket""") { (s, d) =>
      val wExpr = classifierWExpr
      val docb = classifierDocb(s, d)
      // memoized (not a raw persist) so releaseCaches() can free it;
      // the gradient join below reads it twice otherwise
      val resid = memoized(s, s"classifierResid:$d") {
        docb
          .selectExpr("doc_id", "lang", "dc", s"$wExpr AS w")
          .groupBy(col("doc_id"))
          .agg(max(col("lang")).as("lang"),
            sum(expr("dc * w")).cast("bigint").as("sw"),
            sum(col("dc")).cast("bigint").as("n"))
          .selectExpr("doc_id",
            """CAST(round(1000000 * ((CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 - 1.0 / (1.0 + exp(-(CAST(sw AS DOUBLE) / (1e6 * n)))))) AS BIGINT) AS r""")
      }
      // n_docs is one driver scalar (the vocabSize pattern) and
      // materializes the memoized resid the gradient join reads
      val nd = resid.count()
      docb.join(resid, Seq("doc_id"))
        .groupBy(col("b"))
        .agg(sum(expr("dc * r")).cast("bigint").as("grad_micro"))
        .selectExpr("b AS bucket", s"$wExpr AS w_old", "grad_micro",
          s"($wExpr) + CAST(grad_micro AS DOUBLE) / ${nd}L AS w_new")
        .orderBy(col("bucket"))
    },

    // ---- multi-epoch classifier trainer (the full training loop) ----------
    // q_classifier_train_step is one epoch; the production recipe
    // iterates with the updated weight table broadcast back in. This
    // is that loop, run for a fixed 3 epochs ENTIRELY in exact
    // integers so the whole trajectory hash-matches: weights stay
    // integer micro units across epochs (the update truncates
    // grad/n_docs toward zero symmetrically — `g DIV n` on the
    // non-negative magnitude, identical on both engines, where a raw
    // signed floor-vs-truncate would diverge), margins are integer
    // sums against the broadcast integer table, and the per-doc
    // logistic residual rounds once per epoch. Emitted per epoch:
    // training accuracy (n_correct, the sign-match count) plus the
    // weight table's exact sum and L1 mass — a trajectory summary
    // that pins every weight without shipping 4096×epochs rows.
    //
    // 100 TB shape per epoch: one broadcast join of the ≤4096-row
    // weight table over the persisted (doc,bucket) aggregate, one
    // per-doc reduction, one bucket-sized gradient exchange, one
    // bucket-sized update — iterating costs epochs × one corpus pass,
    // exactly like q_bpe_train and q_kmeans_update. The final result
    // is driver-row-sized, so the per-epoch plan gates live on
    // q_classifier_train_step (identical epoch shape).
    // FUSED epoch shape (r19, r18 verdict item 6): the model is 4096
    // integer weights — driver-held, like the k-means codebook. The
    // whole trainer pays ONE by-doc exchange up front (per-doc bucket
    // lists, persisted); each epoch is then two jobs over that cached
    // frame — an accuracy count (no shuffle) and the gradient reduce
    // (explode → 4096-group partial aggregate, the only per-epoch
    // exchange) — instead of the former broadcast-join → by-doc
    // aggregate → re-join → by-b aggregate chain with a weight-frame
    // localCheckpoint per epoch. The in-plan weight lookup is an
    // ARRAY literal indexed by bucket (element_at on a map literal is
    // a linear scan; on an array literal it is O(1) codegen). The
    // integer trajectory is bit-identical: sw/gradient/update are the
    // same integer sums and truncating division, so the generated
    // DuckDB epoch-chain oracle is unchanged.
    "q_classifier_train" -> Q(classifierTrainSql(classifierTrainEpochs)) { (s, d) =>
      import s.implicits._
      val docb = classifierDocb(s, d)
      // ONE init job instead of two (guide §1.2 — fewer passes): the
      // doc count and the occurring-bucket set come from a single
      // aggregate over the cached docb; the md5 init weights are then
      // computed DRIVER-side (java MessageDigest is the same md5 the
      // SQL expression computes — bit-identical init, no extra job).
      val initRow = docb.agg(countDistinct(col("doc_id")),
        collect_set(col("b"))).head()
      val nd = initRow.getLong(0)
      def md5InitW(b: Long): Long = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"w:$b".getBytes("UTF-8"))
          .map(x => f"$x%02x").mkString
        java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2000001L - 1000000L
      }
      val da = memoized(s, s"classifierDa:$d") {
        docb.groupBy(col("doc_id"))
          .agg(max(col("lang")).as("lang"),
            collect_list(struct(col("b"), col("dc"))).as("bs"),
            sum(col("dc")).cast("bigint").as("n"))
      }
      // driver model: weights for the buckets that occur (trajectory
      // sums are over occurring buckets, as before); a dense 4096
      // array carries them into the plan
      var w: Map[Long, Long] = initRow.getSeq[Long](1)
        .iterator.map(b => b -> md5InitW(b)).toMap
      val traj = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long)]
      for (e <- 1 to classifierTrainEpochs) {
        val warr = Array.tabulate(4096)(b => w.getOrElse(b.toLong, 0L))
        val scored = da
          .withColumn("sw", aggregate(col("bs"), lit(0L), (acc, x) =>
            acc + x.getField("dc") *
              element_at(typedlit(warr.toSeq), x.getField("b").cast("int") + 1)))
          .withColumn("r", expr(
            """CAST(round(1000000 * ((CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 - 1.0 / (1.0 + exp(-(CAST(sw AS DOUBLE) / (1e6 * n)))))) AS BIGINT)"""))
        // ONE job per epoch instead of two: the accuracy count rides
        // the gradient aggregate as a sentinel bucket (b = -1 carries
        // the per-doc correctness flag; real buckets are ≥ 0), so the
        // epoch pays a single pass over the cached per-doc frame.
        val gAll = scored.select(col("r"),
            explode(concat(col("bs"), array(struct(
              lit(-1L).as("b"),
              expr("CAST((sw > 0) = (lang = 'en') AS BIGINT)").as("dc"))))).as("bx"))
          .groupBy(col("bx.b").as("b"))
          .agg(sum(when(col("bx.b") === -1L, col("bx.dc"))
            .otherwise(expr("bx.dc * r"))).cast("bigint").as("g"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val nCorrect = gAll.getOrElse(-1L, 0L)
        val g = gAll - (-1L)
        w = w.map { case (b, wv) =>
          val gv = g.getOrElse(b, 0L)
          b -> (wv + (if (gv >= 0) gv / nd else -((-gv) / nd)))
        }
        traj += ((e, nCorrect, nd, w.valuesIterator.sum,
          w.valuesIterator.map(math.abs).sum))
      }
      traj.toSeq.toDF("epoch", "n_correct", "n_docs", "w_sum", "w_l1")
        .orderBy(col("epoch"))
    },

    // ---- exact distributed global ranking ---------------------------------
    // Curation pipelines order the WHOLE corpus by a quality signal
    // ("keep the best-scoring X%", curriculum ordering) — which naively
    // is row_number() over an unpartitioned window: one task holding
    // the corpus. GlobalRank.withRank is the exact distributed form
    // (range-split by a mergeable percentile sketch, per-bucket window,
    // bucket-count offsets — see its scaladoc); this query ranks every
    // document by the trained-classifier score with doc_id breaking
    // ties, and hash-matches DuckDB's single-node row_number() — the
    // definition the distributed form must reproduce bit-for-bit.
    "q_global_rank" -> Q(
      s"""WITH $qmodelCteSql,
          sq AS (SELECT doc_id, CAST(sw AS DOUBLE) / (1e6 * n) AS score FROM qm)
          SELECT doc_id, score,
                 CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
          FROM sq ORDER BY doc_id""") { (s, d) =>
      val scored = qmodelAgg(s, d)
        .selectExpr("doc_id", "CAST(sw AS DOUBLE) / (1e6 * n) AS score")
      graft.operators.GlobalRank
        .withRank(scored, col("score"), col("doc_id"), "rnk")
        .select(col("doc_id"), col("score"), col("rnk"))
        .orderBy(col("doc_id"))
    },

    // ---- reciprocal-rank fusion of curation signals -----------------------
    // Ensemble selection (Cormack/Clarke/Buettcher 2009 RRF; the
    // DataComp-style recipe of fusing independent quality signals by
    // RANK, immune to their incomparable scales): score each document
    // by sum_s 1/(60 + rank_s). Two signals here — the trained
    // classifier score and raw document length — each ranked exactly
    // and distributed via GlobalRank.withRank, then one doc_id join.
    // Float discipline: 1/(60+r) sums are order-dependent doubles, so
    // both engines compute nano-scaled INTEGER contributions
    // (1e9 DIV (60+r), floor division of positive longs — identical
    // on both engines) and sum those exactly.
    "q_rank_fusion" -> Q(
      s"""WITH $qmodelCteSql,
          sq AS (SELECT doc_id, CAST(sw AS DOUBLE) / (1e6 * n) AS score FROM qm),
          rq AS (SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_quality
                 FROM sq),
          rl AS (SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS r_length
                 FROM documents)
          SELECT rq.doc_id, r_quality, r_length,
                 CAST(1000000000 // (60 + r_quality)
                    + 1000000000 // (60 + r_length) AS BIGINT) AS rrf_nano
          FROM rq JOIN rl ON rq.doc_id = rl.doc_id
          ORDER BY rrf_nano DESC, rq.doc_id""") { (s, d) =>
      // FUSED scalar jobs (r22, r21 verdict item 4): both signals'
      // range boundaries come from one tagged-union sketch aggregate
      // and both signals' bucket counts from a second — 2 driver jobs
      // + the final action where the per-signal form paid 4 + 1,
      // still exactly one corpus exchange per signal (the per-bucket
      // window sorts).
      val Seq(rqRanked, rlRanked) = graft.operators.GlobalRank.withRanks(Seq(
        (qmodelAgg(s, d)
          .selectExpr("doc_id", "CAST(sw AS DOUBLE) / (1e6 * n) AS score"),
          col("score"), col("doc_id"), "r_quality"),
        (t(s, d, "documents").select(col("doc_id"), col("n_chars")),
          col("n_chars"), col("doc_id"), "r_length")))
      val rq = rqRanked.select(col("doc_id"), col("r_quality"))
      val rl = rlRanked.select(col("doc_id"), col("r_length"))
      rq.join(rl, Seq("doc_id"))
        .selectExpr("doc_id", "r_quality", "r_length",
          """CAST(1000000000L DIV (60 + r_quality)
               + 1000000000L DIV (60 + r_length) AS BIGINT) AS rrf_nano""")
        .orderBy(col("rrf_nano").desc, col("doc_id"))
    },

    // ---- Gopher rule battery (published heuristic-filter suite) -----------
    // The Rae et al. 2021 (Gopher, §A1.1) document-quality rules as a
    // single audit pass, distinct from q_text_quality's corpus floor:
    // word count in [50, 100k], mean word length in [3, 10],
    // symbol-to-word ratio (# or ellipsis) <= 0.1, >= 80% of words
    // containing an alphabetic character, and >= 2 hits from the
    // required-stopword set {the,be,to,of,and,that,have,with}. The
    // two LINE-level Gopher rules (bullet-start / ellipsis-end
    // fractions) are omitted: this corpus carries no newlines, so
    // they would be constants, not measurements — on a real crawl
    // they are two more filter() terms over split(text, '\n') in the
    // same map-side pass. Output carries the measured statistics, not
    // just the verdict, so the hash gate pins the arithmetic.
    //
    // 100 TB shape: pure map — every rule is a codegen'd
    // filter/aggregate over the per-doc token array, zero joins, zero
    // shuffles (the ORDER BY is presentation only; the driver gate
    // sorts anyway). This is the cheapest possible curation pass and
    // the first stage a real pipeline runs, which is why it must not
    // shuffle.
    "q_gopher_rules" -> Q(
      s"""WITH $gopherCteSql
          SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio,
                 stop_hits, keep
          FROM g ORDER BY doc_id""") { (s, d) =>
      gopherFrame(s, d).orderBy(col("doc_id"))
    },

    // ---- DSIR importance weights (hashed-n-gram domain resampling) --------
    // Xie et al. 2023 (Data Selection via Importance Resampling): score
    // every raw document by log p_target/p_raw under bag-of-hashed-
    // unigram models — the published cheap way to tilt a web-scale
    // corpus toward a target domain without training a classifier.
    // Target here = the lang='en' slice; features = tokens hashed to
    // 4096 buckets (md5-60bit % 4096, the corpus-wide hash idiom);
    // both models are add-one-smoothed bucket multinomials.
    //
    // Cross-engine float discipline (the q_lm_perplexity trick): each
    // bucket's log-ratio is rounded to integer micro-nats once —
    // ln((ct+1)/(Nt+B)) - ln((cr+1)/(Nr+B)) on exact integer inputs
    // is the same IEEE value on both engines — and per-doc totals are
    // exact integer sums of count x micro, divided back to a double in
    // one final IEEE division.
    //
    // 100 TB shape: both count tables are BUCKET-sized (4096 rows, by
    // construction — unlike a vocabulary they cannot grow with the
    // corpus), so the scoring join is a broadcast over the per-doc
    // bucket-count frame and every aggregate is partial-aggregable.
    // The persisted docb frame is read three times (ct, cr, scoring)
    // instead of re-tokenizing the corpus per table.
    "q_dsir_weights" -> Q(
      s"""WITH $classifierCteSql,
         cr AS (SELECT b, CAST(sum(dc) AS BIGINT) AS crc FROM docb GROUP BY b),
         ct AS (SELECT b, CAST(sum(dc) AS BIGINT) AS ctc FROM docb
                WHERE lang = 'en' GROUP BY b),
         tot AS (SELECT CAST(sum(crc) AS BIGINT) AS nr FROM cr),
         tott AS (SELECT CAST(coalesce(sum(ctc), 0) AS BIGINT) AS nt FROM ct),
         ratio AS (SELECT cr.b,
                     CAST(round((ln((coalesce(ct.ctc, 0) + 1.0) / (tott.nt + 4096))
                               - ln((cr.crc + 1.0) / (tot.nr + 4096))) * 1000000) AS BIGINT) AS micro
                   FROM cr LEFT JOIN ct ON cr.b = ct.b
                   CROSS JOIN tot CROSS JOIN tott)
         SELECT d.doc_id, CAST(sum(d.dc) AS BIGINT) AS n_tokens,
                CAST(sum(d.dc * r.micro) AS BIGINT) AS logw_micro,
                CAST(sum(d.dc * r.micro) AS DOUBLE) / (1e6 * sum(d.dc)) AS avg_logw,
                CAST(CASE WHEN sum(d.dc * r.micro) > 0 THEN 1 ELSE 0 END AS INT) AS keep
         FROM docb d JOIN ratio r ON d.b = r.b
         GROUP BY d.doc_id ORDER BY doc_id""") { (s, d) =>
      val docb = classifierDocb(s, d)
      val cr = docb.groupBy(col("b")).agg(sum(col("dc")).cast("bigint").as("crc"))
      val ct = docb.filter(col("lang") === "en")
        .groupBy(col("b")).agg(sum(col("dc")).cast("bigint").as("ctc"))
      // both totals in ONE driver-side pass over the persisted docb
      // (a scalar each, like vocabSize — never corpus-sized work);
      // two separate collects would run the materialize job twice
      val totRow = docb.agg(
        sum(col("dc")).cast("bigint"),
        coalesce(sum(when(col("lang") === "en", col("dc"))).cast("bigint"), lit(0L))).head()
      val (nr, nt) = (totRow.getLong(0), totRow.getLong(1))
      // ct is bucket-sized BY CONSTRUCTION (≤4096 rows) — declare the
      // broadcast instead of relying on the auto threshold, which a
      // host session may have disabled
      val ratio = cr.join(broadcast(ct), Seq("b"), "left")
        .selectExpr("b",
          s"""CAST(round((ln((coalesce(ctc, 0) + 1.0) / (${nt}L + 4096))
                        - ln((crc + 1.0) / (${nr}L + 4096))) * 1000000) AS BIGINT) AS micro""")
      docb.join(broadcast(ratio), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("dc")).cast("bigint").as("n_tokens"),
             sum(col("dc") * col("micro")).cast("bigint").as("logw_micro"))
        .selectExpr("doc_id", "n_tokens", "logw_micro",
          "CAST(logw_micro AS DOUBLE) / (1e6 * n_tokens) AS avg_logw",
          "CAST(CASE WHEN logw_micro > 0 THEN 1 ELSE 0 END AS INT) AS keep")
        .orderBy(col("doc_id"))
    },

    // ---- cross-modal curation funnel (rules ∧ dedup ∧ embedding balance) --
    // The query a curation user actually runs: three independent keep
    // signals — the Gopher rule battery (text heuristics), exact
    // dedup (content identity), and cluster-balanced subsampling
    // (embedding topology) — joined on doc_id = vec_id (the corpus
    // convention: embeddings row i embeds document i) into ONE
    // declarative plan with per-stage verdicts, so a dropped doc
    // says WHY it dropped. Docs without a live embedding (zero
    // vector) carry no cluster verdict and pass the balance stage
    // (coalesce 1): un-embeddable is not a reason to drop.
    //
    // 100 TB shape: the rule stage is map-only; dedup is one
    // md5-keyed partial aggregate joined back by hash; the balance
    // relation is the one-scan kernel + codebook-sized broadcast
    // from q_cluster_balance. The three-way combine joins by doc_id
    // — co-partitioned exchanges, no pairwise anything.
    "q_curate_joint" -> Q(
      s"""WITH $gopherCteSql,
          ${graft.queries.VectorOps.clusterBalanceCteSql},
          dk AS (SELECT doc_id, md5(text) AS h FROM documents),
          kk AS (SELECT h, min(doc_id) AS keep_id FROM dk GROUP BY h),
          dd AS (SELECT dk.doc_id,
                   CAST(CASE WHEN dk.doc_id = kk.keep_id THEN 1 ELSE 0 END AS INT) AS dup_keep
                 FROM dk JOIN kk ON dk.h = kk.h)
          SELECT g.doc_id, g.keep AS rule_keep, dd.dup_keep,
                 CAST(coalesce(bal.keep, 1) AS INT) AS balance_keep,
                 CAST(g.keep * dd.dup_keep * coalesce(bal.keep, 1) AS INT) AS keep
          FROM g JOIN dd ON g.doc_id = dd.doc_id
          LEFT JOIN bal ON g.doc_id = bal.vec_id
          ORDER BY g.doc_id""") { (s, d) =>
      val rules = gopherFrame(s, d).select(col("doc_id"), col("keep").as("rule_keep"))
      val hashes = t(s, d, "documents").select(col("doc_id"), md5(col("text")).as("h"))
      val dd = hashes
        .join(hashes.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id")), Seq("h"))
        .selectExpr("doc_id",
          "CAST(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END AS INT) AS dup_keep")
      val bal = graft.queries.VectorOps.clusterBalance(s, d)
        .select(col("vec_id").as("doc_id"), col("keep").as("bk"))
      rules.join(dd, Seq("doc_id"))
        .join(bal, Seq("doc_id"), "left")
        .selectExpr("doc_id", "rule_keep", "dup_keep",
          "CAST(coalesce(bk, 1) AS INT) AS balance_keep",
          "CAST(rule_keep * dup_keep * coalesce(bk, 1) AS INT) AS keep")
        .orderBy(col("doc_id"))
    },

    // ---- bigram-LM perplexity scoring (the CCNet/KenLM-style filter) ------
    // The OTHER published quality signal next to the classifier
    // (q_quality_model): score each document by its per-token cross-
    // entropy under an n-gram language model trained on the corpus
    // itself — high-perplexity docs are the boilerplate/gibberish
    // tail a curation pipeline trims. Model = add-one-smoothed bigram
    // conditionals, p(w2|w1) = (c(w1 w2)+1)/(c(w1 ·)+V).
    //
    // Cross-engine float discipline: a per-doc SUM of ln() terms is
    // order-dependent in doubles, so each bigram type's ln-prob is
    // rounded to integer MICRO-NATS first (deterministic per type),
    // per-doc totals are then exact integer sums of count×micro, and
    // the final average divides back to a double in ONE unrounded
    // IEEE division chain — the same trick that makes q_quality_model
    // and the winnowing sketch engine-exact. No round() on the
    // output: integer sums divided by nb can land exactly on a
    // decimal half-tick, where Spark (decimal-string HALF_UP) and
    // DuckDB (binary-double scaling) break the tie differently —
    // observed as 2/5000 mismatching rows at sf0.1 before this form.
    //
    // 100 TB shape: both model tables (bigram counts, left-context
    // counts) are vocabulary-sized partial aggregates — Zipf keeps
    // them orders of magnitude below the corpus, so the scoring join
    // broadcasts the model over the per-doc bigram-type frame; the
    // per-doc reduction is an integer partial agg. Nothing in the
    // pipeline is corpus-pair-sized. Docs with <2 tokens have no
    // bigrams and drop out (both engines, by the inner model join).
    "q_lm_perplexity" -> Q(
      s"""WITH $lmModelCteSql
         SELECT d.doc_id, CAST(sum(d.dc) AS BIGINT) AS n_bigrams,
                CAST(-sum(d.dc * m.micro) AS DOUBLE) / (1e6 * sum(d.dc)) AS avg_nll
         FROM docbg d JOIN model m ON d.w1 = m.w1 AND d.w2 = m.w2
         GROUP BY d.doc_id ORDER BY doc_id""") { (s, d) =>
      val (docbg, model) = lmModelFrames(s, d)
      docbg.join(broadcast(model.select(col("w1"), col("w2"), col("micro"))),
          Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(sum(col("dc")).as("nb"), sum(col("dc") * col("micro")).as("sm"))
        .selectExpr("doc_id", "CAST(nb AS BIGINT) AS n_bigrams",
          "CAST(-sm AS DOUBLE) / (1e6 * nb) AS avg_nll")
        .orderBy(col("doc_id"))
    },

    // ---- bigram-LM trainer (the model table itself) -----------------------
    // The trainer half of the LM family (q_lm_perplexity is the
    // apply): emit the add-one-smoothed bigram model — raw pair
    // count, left-context total, and the micro-nat conditional
    // ln p(w2|w1) every scorer consumes. ONE shared construction
    // (lmModelFrames/lmModelCteSql) feeds both queries, so a scoring
    // run can never drift from the published model. Vocabulary-sized
    // output: Zipf keeps bigram TYPES orders of magnitude below
    // corpus tokens, which is exactly why the model broadcasts at
    // scoring time.
    "q_lm_train" -> Q(
      s"""WITH $lmModelCteSql
         SELECT w1, w2, c12, c1, micro FROM model ORDER BY w1, w2""") { (s, d) =>
      val (_, model) = lmModelFrames(s, d)
      model.select(col("w1"), col("w2"), col("c12"), col("c1"), col("micro"))
        .orderBy(col("w1"), col("w2"))
    },

    // ---- one BPE merge round (tokenizer-training primitive) ---------------
    // Byte/word-pair-encoding vocab learning, one round: pick the
    // globally most frequent adjacent pair (ties lexicographic) and
    // count, per document, the GREEDY left-to-right non-overlapping
    // merge sites — the number of tokens the merge removes, which is
    // what drives the next round's counts. Greedy sites ≠ bigram
    // count only when the pair is a repeated token (occurrences of
    // (a,b) at p and p+1 force b=a): for w1≠w2 every occurrence
    // merges; for w1=w2 each maximal run of length L yields
    // floor(L/2) — computed via the same gaps-and-islands shape as
    // the span family. Fully oracled; the repeated-token branch is
    // cold on this corpus, so the planted-truth spec exercises it.
    //
    // 100 TB shape: pair selection is a vocabulary-sized partial
    // aggregate reduced to one driver scalar (real BPE training
    // batches the top-m pairs per round — same plan, m rows); the
    // site count is a map-side filter + per-doc partial agg. One
    // corpus scan per merge round, the textbook distributed-BPE
    // iteration.
    "q_bpe_merge_step" -> Q(
      """WITH toksrc AS (SELECT doc_id,
              list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
            FROM documents),
         bg AS (SELECT doc_id,
                  unnest([toks[i] for i in range(1, len(toks))]) AS w1,
                  unnest([toks[i+1] for i in range(1, len(toks))]) AS w2
                FROM toksrc),
         bgc AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
         best AS (SELECT w1, w2 FROM bgc ORDER BY c DESC, w1, w2 LIMIT 1),
         tok AS (SELECT doc_id, unnest(toks) AS tok,
                   unnest(range(1, len(toks) + 1)) - 1 AS pos
                 FROM toksrc),
         marked AS (SELECT t.doc_id, t.pos,
                      t.pos - row_number() OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS isl
                    FROM tok t JOIN best b ON t.tok = b.w1),
         runs AS (SELECT doc_id, isl, count(*) AS L FROM marked GROUP BY doc_id, isl),
         same AS (SELECT doc_id, CAST(sum(L // 2) AS BIGINT) AS merges
                  FROM runs GROUP BY doc_id HAVING sum(L // 2) > 0),
         diff AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS merges
                  FROM bg JOIN best b ON bg.w1 = b.w1 AND bg.w2 = b.w2
                  GROUP BY bg.doc_id),
         sel AS (SELECT doc_id, merges FROM diff WHERE (SELECT w1 <> w2 FROM best)
                 UNION ALL
                 SELECT doc_id, merges FROM same WHERE (SELECT w1 = w2 FROM best))
         SELECT s.doc_id, b.w1, b.w2, s.merges
         FROM sel s CROSS JOIN best b ORDER BY s.doc_id""") { (s, d) =>
      val bg = bigramRows(s, d)
      val best = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w1"), col("w2")).limit(1)
        .select(col("w1"), col("w2")).head()
      val (a, b) = (best.getString(0), best.getString(1))
      val merges =
        if (a != b)
          bg.filter(col("w1") === a && col("w2") === b)
            .groupBy(col("doc_id")).agg(count(lit(1)).cast("bigint").as("merges"))
        else {
          val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          toksFrame(s, d)
            .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
            .filter(col("tok") === a)
            .withColumn("isl", col("pos") - row_number().over(wd))
            .groupBy(col("doc_id"), col("isl")).agg(count(lit(1)).as("L"))
            .groupBy(col("doc_id"))
            .agg(sum(floor(col("L") / 2)).cast("bigint").as("merges"))
            .filter(col("merges") > 0)
        }
      merges
        .select(col("doc_id"), lit(a).as("w1"), lit(b).as("w2"), col("merges"))
        .orderBy(col("doc_id"))
    },

    // ---- multi-round BPE trainer (the tokenizer-build loop) ----------------
    // q_bpe_merge_step is one round; a tokenizer BUILD iterates: per
    // round, pick the most frequent adjacent pair (ties lexicographic
    // — the q_bpe_merge_step selection rule), APPLY it to every
    // sequence with the greedy left-to-right non-overlap rule, and
    // recount. The emitted merge table (round, pair, count) is the
    // vocabulary evolution a tokenizer ships — fully oracled: DuckDB
    // replays the identical rounds via a generated CTE chain with the
    // same windowed greedy application (run-grouped hit positions,
    // even offsets taken, consumed successors dropped), so the whole
    // n-round trajectory hash-matches.
    //
    // 100 TB shape: every ROUND is one corpus pass — a by-doc window
    // chain for the rebuild (no joins; the merged sequences
    // re-materialize via eager localCheckpoint, the honest shape for
    // ANY iterative trainer) plus a vocabulary-sized partial pair
    // aggregate reduced to a driver-sized candidate window. Since
    // r18 the loop batches every merge it can PROVE sequential
    // (bpeSelectSeqBatch: disjoint ranked prefix under the new-pair
    // bound), so n merges cost as few corpus passes as the corpus's
    // conflict structure allows — the organic documents corpus takes
    // all 6 in one round — while the emitted trajectory and its
    // oracle remain the exact m=1 sequence at any batching.
    "q_bpe_train" -> Q(bpeTrainSql(bpeTrainRounds)) { (s, d) =>
      import s.implicits._
      bpeTrainLoop(s, d)._1.toDF("round", "w1", "w2", "cnt").orderBy(col("round"))
    },

    // ---- top-m batched BPE training (r15 directive 3) ---------------------
    // Real vocabulary builds batch m merges per round so one
    // vocabulary-sized pair aggregate amortizes across m merges (6
    // rounds of m=1 pay 6 corpus passes for 6 merges; 3 rounds of m=8
    // pay 3 for up to 24). Per round: the pair aggregate → a
    // 4m-candidate driver read → the blocking conflict rule
    // (bpeSelectTopm — kept pairs pairwise token-disjoint, so ONE
    // window pass applies the whole batch) → one batched apply.
    // Counts are pre-round adjacencies for the whole batch — the
    // standard batched-BPE approximation, and where top-m diverges
    // from m×top-1 (GroundTruthSpec pins a fixture where it does).
    // Fully hash-match oracled via the generated NOT-EXISTS CTE chain.
    "q_bpe_train_topm" -> Q(bpeTopmSql(bpeTopmRounds, bpeTopmM, bpeTopmCand)) { (s, d) =>
      import s.implicits._
      bpeTrainTopmLoop(s, d).toDF("round", "sel", "w1", "w2", "cnt")
        .orderBy(col("round"), col("sel"))
    },

    // ---- tokenizer apply (the consumer half of train -> apply) ------------
    // Tokenize the corpus with ALL the merges q_bpe_train learns and
    // report per-document token counts before and after — the
    // compression report a tokenizer build ends with (and the number
    // a token-budgeted mixture consumes). One shared training loop
    // feeds both queries, so the merge table and the applied corpus
    // cannot drift; the oracle extends the same generated CTE chain
    // through round n's apply and counts toks_n per doc.
    "q_bpe_apply" -> Q(bpeApplySql(bpeTrainRounds)) { (s, d) =>
      val fin = bpeTrainLoop(s, d)._2
      toksFrame(s, d)
        .select(col("doc_id"), size(col("toks")).cast("bigint").as("n_tokens_raw"))
        .join(fin.select(col("doc_id"),
          size(col("toks")).cast("bigint").as("n_tokens_bpe")), Seq("doc_id"), "left")
        .selectExpr("doc_id", "n_tokens_raw",
          "coalesce(n_tokens_bpe, 0L) AS n_tokens_bpe")
        .orderBy(col("doc_id"))
    },

    // ---- per-source quality mix (curation reporting) ----------------------
    // The report a curation run ends with: per source, how many docs
    // land in each quality class and what share of the source that is.
    // Counts are integers, the share is one long/long IEEE division —
    // exact in both engines. One (source, quality) partial-aggregated
    // shuffle over the per-doc quality frame; at scale the aggregate
    // output is |sources|×|classes|-sized.
    "q_quality_by_source" -> Q(
      s"""WITH q AS ($qualitySql)
          SELECT d.source, q.quality, count(*) AS n,
                 CAST(count(*) AS DOUBLE) /
                 CAST(sum(count(*)) OVER (PARTITION BY d.source) AS DOUBLE) AS share
          FROM q JOIN documents d USING (doc_id)
          GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      val counts = qualityFrame(s, d)
        .join(t(s, d, "documents").select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"), col("quality")).agg(count(lit(1)).as("n"))
      counts
        .withColumn("share", col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("source"))).cast("double"))
        .orderBy(col("source"), col("quality"))
    },

    // ---- language-ID confusion matrix (eval reporting) --------------------
    // Predicted vs labeled language counts — the accuracy report for
    // the lang-ID heuristic. Map-only scoring + one tiny
    // (|langs|²-bounded) aggregate.
    "q_lang_confusion" -> Q(
      s"""SELECT lang, lang_pred, count(*) AS n FROM (
            SELECT lang, $langCase FROM (
              SELECT lang,
                     len(list_filter(toks, x -> x IN ('the','a','and','is','of'))) AS s_en,
                     len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de,
                     len(list_filter(toks, x -> x IN ('el','la','los','que','y'))) AS s_es,
                     len(list_filter(toks, x -> x IN ('le','les','et','des','une'))) AS s_fr
              FROM (SELECT lang,
                      list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS toks
                    FROM documents)))
          GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
      t(s, d, "documents")
        .selectExpr("lang",
          "filter(split(lower(text), '\\\\s+'), x -> x != '') AS toks")
        .selectExpr("lang",
          "size(filter(toks, x -> x IN ('the','a','and','is','of'))) AS s_en",
          "size(filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de",
          "size(filter(toks, x -> x IN ('el','la','los','que','y'))) AS s_es",
          "size(filter(toks, x -> x IN ('le','les','et','des','une'))) AS s_fr")
        .selectExpr("lang", langCase)
        .groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred"))
    },

    // ---- language ID: marker-token voting heuristic -----------------------
    "q_lang_id" -> Q(
      s"""SELECT doc_id, $langCase FROM (
            SELECT doc_id,
                   len(list_filter(toks, x -> x IN ('the','a','and','is','of'))) AS s_en,
                   len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de,
                   len(list_filter(toks, x -> x IN ('el','la','los','que','y'))) AS s_es,
                   len(list_filter(toks, x -> x IN ('le','les','et','des','une'))) AS s_fr
            FROM (SELECT doc_id,
                    list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS toks
                  FROM documents))
          ORDER BY doc_id""") { (s, d) =>
      toksFrame(s, d)
        .selectExpr("doc_id",
          "size(filter(toks, x -> x IN ('the','a','and','is','of'))) AS s_en",
          "size(filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de",
          "size(filter(toks, x -> x IN ('el','la','los','que','y'))) AS s_es",
          "size(filter(toks, x -> x IN ('le','les','et','des','une'))) AS s_fr")
        .selectExpr("doc_id", langCase)
        .orderBy(col("doc_id"))
    },

    // ---- exact n-gram Jaccard near-dup (inverted-index co-count) ----------
    // Stop-shingle cutoff: a shingle occurring in more than `maxDf`
    // documents is dropped before the self-join — one hot shingle
    // ("of the and") otherwise produces |docs|² candidate pairs, a
    // quadratic blowup on skew at scale. Jaccard is computed in the
    // filtered shingle space (sizes counted post-cutoff) so the metric
    // stays a true Jaccard of the compared sets; the oracle applies
    // the identical cutoff. The hot-shingle set is tiny by construction
    // (≤ |shingles| / maxDf entries) → broadcast anti-join, no shuffle
    // of the inverted index.
    // ---- duplicate-shingle share: per-doc inter-document dup signal -------
    // Gopher/MassiveText-style quality rule: the fraction of a doc's
    // distinct 3-gram shingles that also occur in ANY other document.
    // High shares flag boilerplate and templated spam before pairwise
    // dedup even runs. df comes from a count window over the shared
    // memoized shingle frame (one by-shingle exchange, no self-join),
    // then one per-doc aggregate; the n_shared/n_grams division is a
    // single IEEE op on two integers, so it hash-matches the oracle
    // with no rounding.
    "q_dup_gram_share" -> Q(
      s"""$ngCte,
          sh AS (SELECT doc_id, unnest(ng) AS sh FROM docs),
          dfs AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
          SELECT s.doc_id,
                 count(*) AS n_grams,
                 count(*) FILTER (dfs.df > 1) AS n_shared,
                 CAST(count(*) FILTER (dfs.df > 1) AS DOUBLE) / count(*) AS shared_frac
          FROM sh s JOIN dfs ON s.sh = dfs.sh
          GROUP BY s.doc_id ORDER BY s.doc_id""") { (s, d) =>
      shingleRows(s, d)
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
             count(when(col("df") > 1, lit(1))).as("n_shared"))
        .withColumn("shared_frac", col("n_shared").cast("double") / col("n_grams"))
        .orderBy(col("doc_id"))
    },

    "q_dedup_ngram" -> Q(
      s"""$ngCte,
          inv0 AS (SELECT doc_id, unnest(ng) AS sh FROM docs),
          inv AS (SELECT doc_id, sh FROM inv0
                  WHERE sh NOT IN (SELECT sh FROM inv0 GROUP BY sh HAVING count(*) > $maxDfSql)),
          sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY doc_id),
          co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                 FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
          SELECT doc_a, doc_b, jaccard FROM (
            SELECT doc_a, doc_b,
                   CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
            FROM co JOIN sizes sa ON sa.doc_id = doc_a
                    JOIN sizes sb ON sb.doc_id = doc_b)
          WHERE jaccard >= 0.6 ORDER BY doc_a, doc_b""") { (s, d) =>
      ngramPairs(s, d).orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- dedup clusters: connected components over near-dup pairs ---------
    // The deliverable of a dedup pipeline is not the pair list but the
    // KEEP-LIST: transitive closure of the near-dup relation, one
    // canonical doc (min doc_id) kept per component. Spark side:
    // large-star/small-star contraction over the EDGE set only
    // (starComponents above) — O(log n) rounds regardless of diameter,
    // per-round shuffle sized by |pairs|, corpus joined once at the
    // end. Oracle: DuckDB recursive CTE computes the same closure
    // exactly.
    "q_dedup_clusters" -> Q(
      s"""${ngCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
          inv0 AS (SELECT doc_id, unnest(ng) AS sh FROM docs),
          inv AS (SELECT doc_id, sh FROM inv0
                  WHERE sh NOT IN (SELECT sh FROM inv0 GROUP BY sh HAVING count(*) > $maxDfSql)),
          sizes AS (SELECT doc_id, count(*) AS n FROM inv GROUP BY doc_id),
          co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                 FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
          pairs AS (SELECT doc_a, doc_b FROM (
                      SELECT doc_a, doc_b,
                             CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
                      FROM co JOIN sizes sa ON sa.doc_id = doc_a
                              JOIN sizes sb ON sb.doc_id = doc_b)
                    WHERE jaccard >= 0.6),
          edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                    UNION ALL SELECT doc_b, doc_a FROM pairs),
          reach(a, b) AS (SELECT a, b FROM edges
                          UNION
                          SELECT reach.a, e.b FROM reach JOIN edges e ON reach.b = e.a),
          roots AS (SELECT a AS doc_id, least(a, min(b)) AS root FROM reach GROUP BY a)
          SELECT d.doc_id,
                 coalesce(r.root, d.doc_id) AS cluster_id,
                 CAST(d.doc_id = coalesce(r.root, d.doc_id) AS INT) AS keep
          FROM documents d LEFT JOIN roots r USING (doc_id)
          ORDER BY d.doc_id""") { (s, d) =>
      // the iteration runs ONLY over pair-touched nodes (≈ 2·|pairs|,
      // a vanishing fraction of the corpus); the full documents table
      // is touched exactly once, by the final left join — the same
      // shape as the oracle's roots / LEFT JOIN documents. No explicit
      // broadcast hint on roots: it is tiny here, but at 100 TB a
      // billion-pair root set must be allowed to shuffle-join (AQE
      // picks broadcast when it fits).
      // no pre-checkpoint: starComponents materializes the pair
      // pipeline exactly once via its own distinct + localCheckpoint
      val pairs = ngramPairs(s, d)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      val (roots, _) = starComponents(pairs)
      t(s, d, "documents").select(col("doc_id"))
        .join(roots.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("root"), col("doc_id")).as("cluster_id"),
          (col("doc_id") === coalesce(col("root"), col("doc_id"))).cast("int").as("keep"))
        .orderBy(col("doc_id"))
    },

    // ---- exact-substring span dedup (repeated-span removal) ---------------
    // Doc-level dedup keeps one copy of a duplicated DOCUMENT; training
    // corpora also carry long verbatim SPANS duplicated across otherwise
    // distinct documents (licenses, boilerplate headers, quoted
    // passages). The published treatment builds one giant suffix array —
    // a single-node construction; the Spark-first shape is duplicated
    // k-gram seed-and-merge: every word-8-gram occurring in more than
    // one document marks its start position, and maximal runs of
    // consecutive duplicated starts merge into spans (gaps-and-islands,
    // the sessionize idiom). A reported span of >= 16 tokens means every
    // 8-gram window inside it occurs in some other document. Output is
    // (doc_id, span_start, span_len) token offsets — exactly what a
    // span masker/trimmer consumes downstream.
    // Scale shape: ONE by-gram exchange (window min/max over g — the
    // q_dup_gram_share df idiom; the >1-distinct-docs test is
    // min(doc_id) != max(doc_id), no distinct aggregation), one by-doc
    // window, one by-doc/island aggregate. Everything linear in corpus
    // grams — no self-join, no candidate explosion, and unlike the
    // suffix array it needs no global sorted structure.
    "q_dedup_spans" -> Q(
      s"""WITH $spansCte
          SELECT doc_id, span_start, span_len FROM spans
          ORDER BY doc_id, span_start""") { (s, d) =>
      dupSpans(s, d).orderBy(col("doc_id"), col("span_start"))
    },

    // ---- span removal: the consumer half of detect -> apply ---------------
    // Applies q_dedup_spans aggressively: every token covered by a
    // reported duplicated span is dropped from every document (the
    // conservative decontamination-style treatment; keep-one-copy
    // needs a cross-document span identity the operator deliberately
    // does not invent). Span lists are tiny per doc — ONE by-doc
    // aggregate groups them into an array, one keyed left join brings
    // them to the corpus, and the removal itself is a map-side
    // higher-order filter over the token array: no token-level join,
    // no explosion. Docs without spans pass through verbatim.
    "q_dedup_spans_apply" -> Q(applySpansSql(spansCte)) { (s, d) =>
      applySpansDf(s, d, dupSpans(s, d))
    },

    // ---- keep-one-copy span dedup ------------------------------------------
    // The canonical-copy variant the remove-all form deliberately is
    // not (a license-header trimmer wants ONE surviving copy, not
    // zero): per duplicated 8-gram the canonical holder is
    // min(doc_id) — that doc keeps its occurrence, every other doc's
    // is excised. The keeper identity is per-gram, riding the SAME
    // window min the >1-docs test already computes, so relative to
    // q_dedup_spans_apply this costs nothing: same one by-gram
    // exchange, same islands, same single keyed left join to the
    // corpus, still no token-level join. Spans whose copies span
    // multiple canonical holders split at the holder boundary, which
    // only preserves more text (documented on dupSpansKeepOne).
    "q_dedup_spans_keep1" -> Q(applySpansSql(keep1SpansCte)) { (s, d) =>
      applySpansDf(s, d, dupSpansKeepOne(s, d))
    },

    // ---- MinHash + LSH near-dup (sub-quadratic scale path) ----------------
    // 16 minhashes over word-3-gram shingles, 4 bands × 4 rows; candidate
    // pairs from band-bucket equi-join, then exact Jaccard verification.
    // Hashing is md5-derived (minhashOracleSql scaladoc) → FULL oracle.
    //
    // Plan notes (the r2 version cost 31 s / 44% of the bench): the
    // signature is computed over EXPLODED shingle rows — 16 codegen'd
    // hash projections + a hash-aggregate of 16 mins — instead of
    // nested array lambdas (higher-order functions are interpreted and
    // the per-shingle hashing dominated the whole bench). Verification
    // is a co-count over the inverted index restricted to candidate
    // documents (broadcast semi-join): the co-count IS the intersection
    // size, so no shingle arrays are ever shipped across a join. The
    // shingle exchange and the signature exchange are each computed once
    // and reused across branches (ReusedExchange).
    "q_dedup_minhash" -> Q(minhashOracleSql) { (s, d) =>
      val shingles = shingleRows(s, d)
      // derive the 16 hash families by re-hashing ONE 60-bit base
      // hash (rendered as its decimal string) with the family index,
      // instead of hashing the ~30-byte shingle string 16 times —
      // same independence, fewer bytes through the md5 kernel, and
      // the construction mirrors the oracle CTE exactly.
      val hashed = shingles
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(sh), 1, 15), 16, 10) AS BIGINT)").as("hb"))
        .select(col("doc_id") +:
          (0 until 16).map(j =>
            expr(s"CAST(conv(substring(md5(concat(CAST(hb AS STRING), ':$j')), 1, 15), 16, 10) AS BIGINT)")
              .as(s"h$j")): _*)
      // sig is one 17-column row per doc — persist so the band build,
      // candidate join, and size lookups all read it instead of
      // re-running the hash aggregate per branch.
      val sig = hashed.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n"),
        (0 until 16).map(j => min(col(s"h$j")).as(s"m$j")): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = sig.select(col("doc_id"), posexplode(array(
        (0 until 4).map(b =>
          md5(concat_ws(",", (b * 4 until b * 4 + 4).map(j => col(s"m$j").cast("string")): _*))): _*
      ))).toDF("doc_id", "band", "bh")
      // cand is tiny (near-dup pairs only); checkpointing it collapses
      // the DAG — without this the signature subtree executes once for
      // the candDocs broadcast job and again inside the main job.
      // LAZY checkpoint: the candDocs broadcast right below is the
      // materializing action, so the truncation costs no job of its own.
      val cand = bands.select(col("doc_id").as("doc_a"), col("band"), col("bh")).as("a")
        .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("bh")).as("b"),
          Seq("band", "bh"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
        .localCheckpoint(false)
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
      val inv = shingles.join(broadcast(candDocs), Seq("doc_id"))
      val co = inv.as("a").join(inv.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      val sizes = sig.select(col("doc_id"), col("n"))
      cand.join(co, Seq("doc_a", "doc_b"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.6)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- SimHash near-dup -------------------------------------------------
    // simhash from md5-derived token hashes; Manku block-permutation
    // tables (simhashBandKeys above) guarantee by pigeonhole that any
    // pair within Hamming distance 3 shares a table key — the
    // planted-duplicate gate asserts the bucketed result is EXACTLY
    // the exhaustive Hamming<=3 pair set (lossless bucketing), a
    // candidate-volume gate asserts the join stays sub-quadratic, and
    // the DuckDB oracle recomputes the same pair set exhaustively.
    "q_dedup_simhash" -> Q(simhashOracleSql) { (s, d) =>
      simhashCandidates(s, d)
        .filter(col("hamming") <= 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }
  )
}
