package graft.queries

/** The ONE definition of the document-quality floor, shared by the
  * batch quality frame + its DuckDB oracle (TextOps) and the
  * streaming curation funnel (Streams.curateDocs): stop-word list and
  * thresholds live here so the batch and stream paths cannot drift.
  */
object QualityRule {
  val stopWords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")
  val minTokens: Int = 10
  val maxTokens: Int = 2000
  val maxStopRatio: Double = 0.5

  /** `'the','a',…` — splice into a Spark SQL or DuckDB `IN (...)`. */
  val stopListSql: String = stopWords.map(w => s"'$w'").mkString(",")

  /** `n_tokens >= … AND n_tokens <= … AND stop_ratio <= …` — the
    * quality predicate over the scored columns, identical SQL text on
    * both engines.
    */
  val floorSql: String =
    s"n_tokens >= $minTokens AND n_tokens <= $maxTokens AND stop_ratio <= $maxStopRatio"

  /** The ONE fingerprint normalization (md5 of lowercased text with
    * punctuation/whitespace collapsed), shared by the batch dedup
    * family (q_fingerprint / q_dedup_incremental / q_dedup_keep_best)
    * and the streaming exact dedup (Streams.dedupDocs) — a unilateral
    * edit to any copy would silently desynchronize batch, stream, and
    * oracle fingerprints, so there are no copies.
    */
  def fpNormCol: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
  }

  /** DuckDB twin of [[fpNormCol]] (the 'g' flag is DuckDB's
    * replace-all spelling; Spark replaces all by default).
    */
  val fpNormSqlDuck: String =
    "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"

  /** The ONE bloom-filter sizing rule for eval-gram decontamination,
    * shared by the batch q_decontam_bloom and the streaming
    * decontaminateDocs filter: (items, bits) from the measured eval
    * gram cardinality — 29 bits/item ≈ 1e-6 fpp, clamped inside
    * Spark's runtime-filter caps (4M items / 64M bits).
    */
  def bloomSizing(nEvalGrams: Long): (Long, Long) = {
    val items = math.min(4000000L, math.max(1000L, nEvalGrams))
    (items, math.min(67108864L, items * 29L))
  }
}
