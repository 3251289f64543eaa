package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for local benchmarking past the driver's
  * sf0.1: writes `copies`× each source table with key spaces shifted
  * per copy, PRESERVING the statistical structure the slow queries
  * measure —
  *  - documents: each copy applies a distinct 1-1 letter substitution
  *    to `text`, so shingle spaces are DISJOINT across copies and the
  *    near-duplicate RATE stays constant (naive duplication would
  *    make every doc a 10-way near-dup and measure candidate
  *    explosion, not scaling). Substitutions compose two disjoint
  *    alphabet rotations (100 distinct permutations — a single
  *    rotation family wraps at 10 copies and replays earlier copies
  *    verbatim). n_chars survives (substitution preserves length).
  *  - embeddings: copy 0 keeps the source vectors; copies >0 get
  *    deterministic hash-noise directions so cosine near-dup and ANN
  *    structure is not artificially replicated either. The per-element
  *    hash MUST mix the dimension index with vec_id (the i*vec_id
  *    cross term below): a phase-only variant (sin(a + i*c), one phase
  *    per vector) puts every copy on a single sinusoid — a rank-2
  *    subspace in which B hyperplanes cut at most 2B LSH arcs, so the
  *    whole scaled corpus collapses into ~2B buckets per table and
  *    candidate volume goes quadratic (measured 4,717 pairs/vec at 10x
  *    vs 20 at 1x before the fix).
  *  - facts (orders/lineitem/customer/supplier/part): every int64
  *    key (pk and fk) shifts by copy*STRIDE consistently, so joins
  *    hold within a copy and key spaces never collide across copies.
  *  - events: read unit-aware via Tables.t, keys shifted per copy,
  *    and each copy time-dilated +400 days onto its disjoint users —
  *    session/gap structure replicates verbatim while the time axis
  *    scales with the data; output is TIMESTAMP_MICROS.
  *  - region/nation: fixed dimension tables, copied as-is.
  *
  * Usage: runMain graft.GenScale <srcSfDir> <outDir> <copies>
  */
object GenScale {

  private[graft] val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copiesStr) = args
    val copies = copiesStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // reuse a live session when invoked in-process (GenScaleSpec);
    // only a session this main created gets stopped at the end
    val existing = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = existing.getOrElse(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    def explodeCopies(df: DataFrame): DataFrame =
      df.withColumn("__k", explode(sequence(lit(0), lit(copies - 1))))
    def shift(c: String): Column = col(c) + col("__k") * Stride

    def write(df: DataFrame, name: String): Unit = {
      // deployment-shaped output (r18): the source tables are single
      // parquet files and the explode-by-copies projection preserves
      // that layout, so a 30× fact table used to land as ONE file
      // with ONE row group — which no scan can split. Every
      // scan-linear bench query then ran its 10×/30× scan on a
      // single task and the curve measured serial I/O, not the
      // engine (sf1 lineitem aggregate: 2.1 s single-file vs 0.5 s
      // split 32 ways, measured). Real corpora at these sizes are
      // many-file; repartition to the session's parallelism so row
      // groups split across tasks like deployment data does.
      df.drop("__k").repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[genscale] $name written")
    }

    // fixed dims: straight copy
    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    write(explodeCopies(spark.read.parquet(s"$srcDir/customer.parquet"))
      .withColumn("c_custkey", shift("c_custkey")), "customer")
    write(explodeCopies(spark.read.parquet(s"$srcDir/supplier.parquet"))
      .withColumn("s_suppkey", shift("s_suppkey")), "supplier")
    write(explodeCopies(spark.read.parquet(s"$srcDir/part.parquet"))
      .withColumn("p_partkey", shift("p_partkey")), "part")
    write(explodeCopies(spark.read.parquet(s"$srcDir/orders.parquet"))
      .withColumn("o_orderkey", shift("o_orderkey"))
      .withColumn("o_custkey", shift("o_custkey")), "orders")
    write(explodeCopies(spark.read.parquet(s"$srcDir/lineitem.parquet"))
      .withColumn("l_orderkey", shift("l_orderkey"))
      .withColumn("l_partkey", shift("l_partkey"))
      .withColumn("l_suppkey", shift("l_suppkey")), "lineitem")

    // events: unit-aware read via Tables.t (the source has shipped as
    // both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across testdata
    // regenerations). Each copy shifts keys AND time-dilates by 400
    // days, so per-user session/gap structure replicates onto disjoint
    // users in a disjoint time range — the time axis scales with the
    // data instead of multiplying per-hour-bucket counts in place.
    // Output is TIMESTAMP_MICROS, the regenerated testdata's encoding,
    // so Tables.t plain-reads it back.
    val prevOutTs = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try write(explodeCopies(Tables.t(spark, srcDir, "events"))
      .withColumn("event_id", shift("event_id"))
      .withColumn("user_id", shift("user_id"))
      .withColumn("ts", expr("timestampadd(DAY, __k * 400, ts)")), "events")
    finally prevOutTs match {
      // restore: a reused live session (GenScaleSpec) must not keep
      // the writer conf this main set
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    // documents: per-copy letter substitution keeps copies' shingle
    // spaces disjoint. TWO disjoint rotation families compose to
    // alpha.length * alphaB.length distinct permutations: a single
    // 10-letter rotation wraps at 10 copies, silently making copy k
    // a VERBATIM replay of copy k-10 (the 30x corpus tripled every
    // shingle space and measured dup explosion, not scaling). For
    // k < 10 the second rotation is the identity, so corpora of up
    // to 10 copies are byte-identical to the single-family output.
    val alpha  = "etaoinsrdl"
    val alphaB = "chumfpgwyb"
    require(copies <= alpha.length * alphaB.length,
      s"only ${alpha.length * alphaB.length} distinct substitutions available")
    val docs = explodeCopies(spark.read.parquet(s"$srcDir/documents.parquet"))
      .withColumn("doc_id", shift("doc_id"))
    val translated = (1 until copies).foldLeft(
      when(col("__k") === 0, col("text"))) { (acc, k) =>
      val rotA = alpha.drop(k % alpha.length) + alpha.take(k % alpha.length)
      val kb = (k / alpha.length) % alphaB.length
      val rotB = alphaB.drop(kb) + alphaB.take(kb)
      acc.when(col("__k") === k, translate(col("text"), alpha + alphaB, rotA + rotB))
    }
    write(docs.withColumn("text", translated), "documents")

    // embeddings: copy 0 verbatim; later copies get deterministic
    // hash-noise directions (dup/ANN structure must not replicate)
    val emb = explodeCopies(spark.read.parquet(s"$srcDir/embeddings.parquet"))
    val noisy = transform(col("embedding"), (x, i) => {
      val h = sin(col("vec_id") * 12.9898 + i * 78.233 + col("__k") * 37.719 +
        i * col("vec_id") * 0.54321) * 43758.5453
      ((h - floor(h)) * 2 - 1).cast("float")
    })
    write(emb
      .withColumn("embedding", when(col("__k") === 0, col("embedding")).otherwise(noisy))
      .withColumn("vec_id", shift("vec_id")), "embeddings")

    if (existing.isEmpty) spark.stop()
  }
}
