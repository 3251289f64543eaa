package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards: the properties that make these queries hold up
  * at scale must be visible in the physical plan — filters reaching
  * the parquet scan, projections pruning the read schema, dimension
  * joins broadcasting, window dedups not shuffling twice. A regression
  * here can pass every correctness check while silently becoming a
  * full-scan at 100 TB.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // plan assertions must not depend on suite order: another suite
    // (ScaleToolsSpec) disables auto-broadcast on the SHARED session,
    // and getOrCreate applies runtime confs — pin the default back
    .config("spark.sql.autoBroadcastJoinThreshold", "10485760")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    SparkEntry.queries(q)(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
  }

  test("point lookup pushes the pk predicate into the parquet scan") {
    val p = plan("q_point_lookup")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("EqualTo(c_custkey,42)"), p)
  }

  test("range scan pushes the range predicate into the parquet scan") {
    val p = plan("q_range_scan")
    assert(p.contains("GreaterThan(o_totalprice,400000.0)"), p)
  }

  test("projection prunes the read schema to selected columns") {
    val p = plan("q_projection")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("c_custkey") && readSchema.contains("c_acctbal"), readSchema)
    assert(!readSchema.contains("c_comment") && !readSchema.contains("c_address"), readSchema)
  }

  test("dimension joins broadcast, fact join does not broadcast the fact side") {
    val p = plan("q_join_bcast_dims")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("aggregates are partial (map-side combine) before the shuffle") {
    val p = plan("q_groupby_q1")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("whole-stage codegen covers the scan+filter+aggregate pipeline") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    // under AQE codegen subtrees exist only once stages have run —
    // execute, then inspect the final adaptive plan (codegen'd nodes
    // print with a '*(n)' prefix)
    val df = SparkEntry.queries("q_agg_filtered")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p.take(800))
  }

  test("ANN scoring runs the native kernels, not interpreted lambdas") {
    // brute-force KNN: per-row norms + dot_product (the oracle-exact
    // form); the LSH path still scores via the cosine_sim kernel
    val p = plan("q_ann_brute")
    assert(p.contains("dot_product"), p)
    assert(!p.contains("aggregate(zip_with"), p)
    val pl = plan("q_ann_lsh")
    assert(pl.contains("cosine_sim"), pl)
    assert(!pl.contains("aggregate(zip_with"), pl)
  }

  test("text quality tokenizes once, behind the shared cache barrier") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    // CollapseProject would otherwise inline the split into each of
    // the 4 sibling consumers (4× tokenization per row, interpreted)
    val df = SparkEntry.queries("q_text_quality")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"), p.take(800))
    assert("split\\(".r.findAllIn(p).size <= 1, p.take(1500))
    spark.catalog.clearCache()
  }

  test("weighted sampling broadcasts the rate table and prunes text from the scan") {
    val p = plan("q_sample_weighted")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // neither the rate aggregate nor the probe needs the text column
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!reads.contains("text"), reads)
  }

  test("decontamination broadcasts the eval-gram set and combines map-side") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final count
  }

  test("boilerplate detection broadcasts per-source doc counts") {
    val p = plan("q_text_boilerplate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("repetition stats aggregate partially before both shuffles") {
    val p = plan("q_text_repetition")
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // two partial+final pairs
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("exact KNN broadcasts queries and scores via the native kernels") {
    val p = plan("q_knn_exact")
    // the query side is broadcast (corpus never shuffles before
    // scoring) and both dot products run the codegen'd kernel
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("dot_product"), p)
    assert(!p.contains("aggregate(zip_with"), p)
  }

  test("vocabulary top-k aggregates partially and prunes text from the final sort") {
    val p = plan("q_vocab_topk")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final pair
    // top-100 is a TakeOrderedAndProject over vocab-sized aggregate
    // output, never a global sort of token rows
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("tf-idf derives df from a window over the tf aggregate, not a self-join") {
    val p = plan("q_tfidf_topterms")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Window"), p)
  }

  test("duplicate-shingle share windows over the shared shingle frame, no self-join") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val df = SparkEntry.queries("q_dup_gram_share")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(p.contains("Window"), p.take(1500))
    spark.catalog.clearCache()
  }

  test("curation funnel broadcasts eval grams and anti-joins contamination") {
    val p = plan("q_pipeline_curate")
    assert(p.contains("BroadcastHashJoin"), p)           // eval-gram semi side
    assert(p.contains("LeftAnti"), p)                    // contaminated-id probe
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)  // partial md5 keep-list
  }

  test("bucketed packing joins broadcast offsets; its corpus window is per-bucket") {
    val p = plan("q_pack_bucketed")
    // the offsets side is broadcast (|sources|x|buckets| rows) and the
    // corpus-sized window partitions by (source, bkt), not source alone
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the CORPUS window is the one ordering by doc_id — it must carry
    // the bucket key; matching any spec containing "bkt" would also
    // accept the tiny offsets window (partitioned by source, ordered
    // by bkt) and miss a regression to a per-source global sort
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toVector
    assert(specs.exists(l => l.contains("source") && l.contains("bkt") && l.contains("doc_id")),
      specs.mkString("\n"))
  }

  test("bucketed shuffle ranks per hash bucket; offsets broadcast back") {
    val p = plan("q_shuffle_bucketed")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the corpus-sized window (the one ordering by the shuffle key sk)
    // must partition by the hash bucket — matching "bkt" alone would
    // also accept the 256-row offsets window and miss a regression to
    // a single-partition global sort
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toVector
    assert(specs.exists(l => l.contains("sk") && l.contains("bkt")), specs.mkString("\n"))
  }

  test("ntile twin assigns buckets map-side after one boundary aggregate, no window") {
    val p = plan("q_ntile_bucketed")
    // the scale claim: NO per-row window (that's q_window_ntile's
    // 5-partition sort), just a partial+final percentile aggregate
    // whose |groups|-sized output broadcasts back onto the scan
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("aggregate LWW plans as a partial+final max-of-struct, no window") {
    val p = plan("q_lww_agg")
    // the skew claim: no per-key window (that shape colocates every
    // version of a hot key in one reducer); a partial+final aggregate
    // pair pre-reduces versions map-side before the one exchange
    assert(!p.contains("Window"), p)
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("heavy-hitters sketch plans as a partial+final ObjectHashAggregate pair") {
    // the scale claim: the Misra-Gries summary combines map-side, so
    // the corpus-level exchange is k rows per partition — a
    // partial_heavy_hitters must appear (no single-reducer fallback).
    // Gated on the sketch subplan directly: in the full query the
    // checkpoint boundary hides the aggregate from the outer plan.
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    graft.functions.GraftFunctions.register(spark)
    val sk = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("explode(filter(split(lower(text), '\\\\s+'), x -> x != '')) AS tok")
      .selectExpr("heavy_hitters(tok, 200) AS hh")
      .queryExecution.explainString(FormattedMode)
    assert(sk.contains("partial_heavy_hitters"), sk)
    assert(sk.contains("ObjectHashAggregate"), sk)
    // and the full query's verdict joins stay broadcast end to end
    val p = plan("q_vocab_heavy_approx")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("bloom decontamination probes map-side: partial filter build, no train-side join") {
    // the scale claim: the bloom twin replaces the exact broadcast
    // semi-join with a scalar-subquery probe — the filter build is a
    // partial-aggregable sketch (partitions build partial blooms that
    // OR-merge) and the 100 TB training side is a FILTER, not a join
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("xxhash64(text) AS h")
      .createOrReplaceTempView("plan_bloom_side")
    val build = spark.sql("SELECT bloom_agg(h, 1000L, 29000L) FROM plan_bloom_side")
      .queryExecution.explainString(FormattedMode)
    assert(build.contains("partial_bloom_filter_agg"), build)
    assert(build.contains("ObjectHashAggregate"), build)
    val probe = spark.sql(
      """SELECT doc_id FROM (SELECT doc_id, xxhash64(text) AS h
           FROM parquet.`/root/testdata/sf0.001/documents.parquet`)
         WHERE bloom_contains((SELECT bloom_agg(h, 1000L, 29000L) FROM plan_bloom_side), h)""")
      .queryExecution.explainString(FormattedMode)
    assert(probe.contains("might_contain"), probe)
    assert(!probe.contains("SortMergeJoin") && !probe.contains("BroadcastHashJoin"), probe)
    // and the declared query's verdict joins stay broadcast
    val p = plan("q_decontam_bloom")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("mixture construction is map-only fan-out: no keyed exchange, no join") {
    val p = plan("q_mix_weighted")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    // the only exchange is the final presentation sort's range
    // partitioning — nothing hash-partitions, nothing aggregates
    assert(!p.contains("hashpartitioning"), p)
    assert(p.contains("rangepartitioning"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("approx quantile plan is a partial-aggregable sketch, no value buffering") {
    val p = plan("q_quantile_group_approx")
    // the scale claim: the quantile aggregate is the mergeable
    // approx_percentile sketch in a partial+final pair (map-side
    // combine), and the exact `percentile` buffer appears nowhere —
    // the rank-count gate is plain partial-aggregated sums
    assert(p.contains("approx_percentile"), p)
    assert(p.contains("partial_approx_percentile"), p)
    assert(!"(?<!approx_)percentile\\(".r.findAllIn(p).hasNext, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("approx ntile twin keeps the bucketed shape with sketch boundaries") {
    val p = plan("q_ntile_bucketed_approx")
    assert(p.contains("partial_approx_percentile"), p)
    assert(!"(?<!approx_)percentile\\(".r.findAllIn(p).hasNext, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the only window is the |groups|*4-row share normalizer, never a
    // corpus-sized one: every windowspecdefinition must partition by
    // the post-aggregate grouping key
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toVector
    assert(specs.forall(_.contains("o_orderpriority")), specs.mkString("\n"))
  }

  test("IVF query reads the materialized inverted file, training nothing") {
    val p = plan("q_ann_ivf")
    // partition pruning on the cid directories = probing P of K
    // clusters touches only P/K of the corpus files
    assert(p.contains("PartitionFilters"), p)
    assert(!p.toLowerCase.contains("posexplode"), p) // projections are build-time only
  }

  test("span dedup: no join anywhere, and the island aggregate reuses the by-doc partitioning") {
    val p = plan("q_dedup_spans")
    // the scale claim vs a suffix array / self-join design: duplicated
    // grams come from a window min/max over the by-gram exchange and
    // spans from gaps-and-islands — there must be NO join of any kind
    // in the plan, and no distinct aggregation for the >1-docs test
    assert(!p.contains("Join"), p)
    assert(!p.toLowerCase.contains("distinct"), p)
    // exchange budget (formatted mode lists each node once in the
    // detail section as "(n) Exchange"): toksFrame pre-explode
    // repartition + the post-cache ENSURE_REQUIREMENTS reshuffle the
    // AQE-wrapped InMemoryRelation forces on every gram pipeline +
    // by-gram window + by-doc window + final range sort = 5. The
    // (doc_id, island) aggregate must NOT add a sixth — subset
    // clustering is satisfied by the by-doc window's partitioning.
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 5, p)
    // and the >1-docs test stays a window min/max, not an aggregate
    // join back
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).size
    assert(specs >= 2, p)
    // eval-leak excision shares the shape: the eval membership mark
    // rides the same by-gram exchange as a window max — no join
    // against a gram set anywhere
    val pd = plan("q_decontam_spans")
    assert(!pd.contains("Join"), pd)
    assert("\\(\\d+\\) Exchange".r.findAllIn(pd).size == 5, pd)
  }

  test("keep-one span apply: one keyed span join, never a token-level join") {
    // the keeper filter rides the detect pipeline's existing window
    // min — the ONLY join in the whole apply plan is the single keyed
    // left join of per-doc span lists back to the corpus (removal is
    // a map-side higher-order filter)
    val p = plan("q_dedup_spans_keep1")
    // formatted mode lists each node once in the detail section as
    // "(n) <Node>" — exactly one join node, and it broadcasts the
    // per-doc span lists (tiny) over the corpus
    val joins = "\\(\\d+\\) \\w*Join".r.findAllIn(p).toVector
    assert(joins.size == 1 && joins.head.contains("BroadcastHashJoin"), joins.toString + p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // and the detect half keeps the span-family discipline: the
    // >1-docs + canonical-holder tests are window min/max, no distinct
    assert(!p.toLowerCase.contains("distinct"), p)
  }

  test("classifier train step: bucket-sized gradient exchange, partial aggregates, no window") {
    val p = plan("q_classifier_train_step")
    // the gradient reduction must exchange on the BUCKET key (≤4096
    // rows cross the wire after map-side combine), never on the corpus
    assert(p.contains("hashpartitioning(b#") || p.contains("hashpartitioning(b,"), p)
    // every aggregate partial+final; no window, no cartesian anywhere
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("LM trainer: vocabulary-sized partial aggregates, no cartesian") {
    val p = plan("q_lm_train")
    // model construction = docbg -> bgc -> ctx, each a partial+final
    // aggregate pair; the ctx join is vocab-sized on both sides
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("LM perplexity broadcasts the model; every aggregate is partial+final") {
    val p = plan("q_lm_perplexity")
    // the scale claim: model tables are vocabulary-sized, so the
    // per-doc scoring join must BROADCAST the model over the bigram
    // frame — a shuffled scoring join would re-exchange the corpus
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // ctx / bgc / docbg / per-doc reduction all combine map-side
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("k-means update: kernel assignment + partial integer aggregate, codebook-sized exchange") {
    val p = plan("q_kmeans_update")
    // the Lloyd step's scale shape: assignment is the map-side
    // cosine_argmax projection (no per-(vector, centroid) rows), and
    // the centroid re-estimation is a partial+final integer aggregate
    // whose exchange is k×dim rows
    assert(p.contains("cosine_argmax"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("semantic dedup assigns via the fused argmax kernel — no n×k rows anywhere") {
    val p = plan("q_dedup_semantic")
    // assignment must be the cosine_argmax PROJECTION against the
    // literal codebook: no per-(vector, centroid) row set may exist
    // in any form — no cross/nested-loop join, no window, no argmax
    // aggregate (the crossJoin+max-of-struct form materialized n×k
    // rows and went super-linear at the 30× scale point)
    assert(p.contains("cosine_argmax"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("Gopher rule battery is map-only: no join, no aggregate, no keyed exchange") {
    val p = plan("q_gopher_rules")
    // the claim that makes this the cheapest pipeline pass: every
    // rule evaluates per row inside codegen. Allowed exchanges: the
    // shared toksFrame's explicit parallelism repartition
    // (REPARTITION_BY_NUM — spreads the scan, carries no operator
    // semantics) and the presentation sort. Forbidden: any exchange
    // Catalyst inserted to satisfy a join/aggregate requirement.
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"), p)
    val keyed = "hashpartitioning[^\n]*ENSURE_REQUIREMENTS".r.findAllIn(p).size
    assert(keyed == 0, p)
  }

  test("DSIR weights broadcast the bucket-sized ratio table; aggregates are partial+final") {
    val p = plan("q_dsir_weights")
    // the scoring join must broadcast the 4096-bucket model over the
    // per-doc bucket frame — shuffling the corpus against a table
    // that is constant-sized by construction would be the wrong plan
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("cross-modal funnel: one plan, kernel assignment, no pairwise rows anywhere") {
    val p = plan("q_curate_joint")
    // three keep signals in one declarative plan: the embedding stage
    // must still be the map-side kernel (no n×k rows), and nothing in
    // the three-way combine may go pairwise
    assert(p.contains("cosine_argmax"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("cluster balance: kernel assignment, broadcast size table, no pairwise rows") {
    val p = plan("q_cluster_balance")
    assert(p.contains("cosine_argmax"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("as-of variants stay merge-scans: one keyed window, no join operator") {
    // forward and tolerance ride the SAME union+window plan as the
    // backward form — a Join node appearing here would mean the
    // range-explosion shape snuck back in
    for (q <- Seq("q_asof_forward", "q_asof_tolerance")) {
      val p = plan(q)
      assert(p.contains("Window"), s"$q: ${p.take(1200)}")
      assert(!p.contains("Join"), s"$q: ${p.take(1200)}")
    }
  }

  test("incremental dedup: existing corpus streams against broadcast candidates") {
    val p = plan("q_dedup_incremental")
    // the corpus-sized existing side must never shuffle — the verify
    // semi-join and the final mark join both broadcast the small side
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("keep-best dedup: partial+final max-of-struct, one keyed join, no pairs") {
    val p = plan("q_dedup_keep_best")
    // the argmax must be a mergeable aggregate (one candidate per
    // partition per fingerprint crosses the exchange), never a window
    // over duplicate groups
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("char entropy: two partial+final aggregate pairs, zero joins") {
    val p = plan("q_text_entropy")
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("Join"), p)
  }

  test("global rank windows WITHIN buckets — never a single-partition window") {
    val p = plan("q_global_rank")
    // the window's partition spec must be the derived range bucket;
    // an unpartitioned row_number would serialize the corpus into one
    // task (exactly what GlobalRank exists to avoid)
    assert(p.contains("__bkt"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("rank fusion: two bucketed windows, a keyed join, no pairwise rows") {
    val p = plan("q_rank_fusion")
    assert("Window".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("__bkt"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pca power step: dim-sized partial+final aggregate, map-side projection fold") {
    val p = plan("q_pca_power")
    // the per-dim aggregate must be partial+final (the exchange is 64
    // rows/partition); the per-row q·w fold must NOT become a join
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("embed whiten: broadcast dim-stats join, two partial+final aggregate pairs") {
    val p = plan("q_embed_whiten")
    // the dim-sized stats table broadcasts back over the exploded
    // corpus — shuffling n·dim rows against 64 rows would be wrong
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("temperature mixture: broadcast rate table, map-only fan-out, no window") {
    val p = plan("q_mix_temperature")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pq encode is one fused projection — no join, no aggregate, no n×k rows") {
    val p = plan("q_pq_encode")
    assert(p.contains("pq_encode"), p.take(2000))
    assert(!p.contains("Join"), p)
    assert(!"HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).hasNext, p)
  }

  test("pq ADC search: broadcast distance table, heap top-k, no window") {
    val p = plan("q_ann_pq_adc")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("topk_struct"), p.take(2000))
  }

  test("z-order codes are map-only: stats are driver scalars, no join, no window") {
    val p = plan("q_zorder")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!"HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).hasNext, p)
  }

  test("ivf-pq: pruned scan, broadcast tables, heap shortlist — exact cosine only on the shortlist") {
    val p = plan("q_ann_ivfpq")
    // every join must broadcast (probes, distance tables, shortlist,
    // query vectors — all workload-sized); the shortlist must be the
    // bounded heap; the only Window is the 50-per-query exact re-rank
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("topk_struct"), p.take(2000))
    // exactly one Window NODE (the shortlist re-rank) — formatted
    // mode prints each node twice and WindowGroupLimit also contains
    // "Window", so count tree entries only
    assert("Window \\(".r.findAllIn(p).size <= 1, p.take(2000))
  }

  test("bm25: broadcast query-term probe, heap top-k — no window, no pair sort") {
    val p = plan("q_bm25_topk")
    // the query-term and df relations (≤48 rows) must broadcast over
    // the corpus tf frame, never shuffle it; the per-query top-5 must
    // be the bounded-heap topk_struct aggregate (k rows per partition
    // cross the exchange), never a per-query window sort
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("topk_struct"), p.take(2000))
  }
}
