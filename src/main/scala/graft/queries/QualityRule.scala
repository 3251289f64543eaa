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
