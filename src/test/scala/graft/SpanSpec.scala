package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-truth gates for the span family. The DuckDB oracles prove
  * Spark and DuckDB compute the same thing; these fixtures prove that
  * thing is the RIGHT thing — exact offsets and lengths of spans
  * constructed by hand:
  *
  *  - two docs share an exact 20-token run (span_len 20, known
  *    start offsets in each doc) → both spans reported verbatim;
  *  - two other docs share a 10-token run — every 8-gram of it is
  *    duplicated, but the merged span (10 tokens) sits below the
  *    16-token report threshold → correctly absent;
  *  - span removal excises exactly the planted run from both
  *    carriers and leaves sub-threshold and unique docs byte-
  *    identical;
  *  - eval-leak excision reports the planted run only for the
  *    TRAINING doc, never for the eval-slice doc that leaked it.
  */
class SpanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  private def writeDocs(docs: Seq[(Long, Seq[String])]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spanspec").toString
    docs.map { case (id, ts) => (id, ts.mkString(" "), "en", "src", ts.mkString(" ").length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val shared20 = toks("s", 20)
  private val shared10 = toks("t", 10)

  test("span detect/apply report and excise exactly the planted 20-token run") {
    val dir = writeDocs(Seq(
      1L -> (toks("u", 4) ++ shared20 ++ toks("v", 16)),  // span at 4, len 20
      2L -> (toks("w", 10) ++ shared20 ++ toks("x", 10)), // span at 10, len 20
      3L -> (toks("y", 20) ++ shared10),                  // sub-threshold pair
      4L -> (shared10 ++ toks("z", 20))))                 // sub-threshold pair
    val spans = SparkEntry.queries("q_dedup_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(spans == Seq((1L, 4, 20), (2L, 10, 20)), spans)

    val applied = SparkEntry.queries("q_dedup_spans_apply")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Number](2).longValue)).toSeq
    assert(applied == Seq(
      1L -> ((toks("u", 4) ++ toks("v", 16)).mkString(" "), 20L),
      2L -> ((toks("w", 10) ++ toks("x", 10)).mkString(" "), 20L),
      3L -> ((toks("y", 20) ++ shared10).mkString(" "), 0L),
      4L -> ((shared10 ++ toks("z", 20)).mkString(" "), 0L)).map { case (a, (b, c)) => (a, b, c) },
      applied)
  }

  test("keep-one-copy apply: the min-doc canonical copy survives, every other copy is excised") {
    val sharedA = toks("a", 20)
    val sharedB = toks("b", 20)
    val dir = writeDocs(Seq(
      1L -> (toks("u", 4) ++ sharedA ++ toks("v", 4)),  // canonical holder of A
      2L -> (toks("w", 5) ++ sharedA ++ toks("x", 5)),  // loses A
      3L -> (sharedA ++ toks("y", 8)),                  // loses A
      7L -> (toks("p", 3) ++ sharedB),                  // canonical holder of B
      8L -> (sharedB ++ toks("q", 3)),                  // loses B
      9L -> toks("z", 30)))                             // unique, untouched
    val out = SparkEntry.queries("q_dedup_spans_keep1")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[Number](2).longValue)).toSeq
    assert(out == Seq(
      (1L, (toks("u", 4) ++ sharedA ++ toks("v", 4)).mkString(" "), 0L),
      (2L, (toks("w", 5) ++ toks("x", 5)).mkString(" "), 20L),
      (3L, toks("y", 8).mkString(" "), 20L),
      (7L, (toks("p", 3) ++ sharedB).mkString(" "), 0L),
      (8L, toks("q", 3).mkString(" "), 20L),
      (9L, toks("z", 30).mkString(" "), 0L)), out)
    // contrast with remove-all: the same corpus loses EVERY copy there
    val all = SparkEntry.queries("q_dedup_spans_apply")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getAs[Number](2).longValue)).toMap
    assert(all(1L) == 20L && all(7L) == 20L,
      s"remove-all must excise the canonical copies keep1 preserves: $all")
  }

  test("eval-leak excision reports the leak only in the training doc") {
    // doc 50 is in the eval slice (doc_id % 50 == 0); doc 1 leaked a
    // 20-token eval run; doc 2 shares nothing with eval
    val dir = writeDocs(Seq(
      50L -> (toks("e", 5) ++ shared20 ++ toks("f", 5)),
      1L  -> (toks("g", 7) ++ shared20 ++ toks("h", 3)),
      2L  -> toks("k", 30)))
    val leaks = SparkEntry.queries("q_decontam_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(leaks == Seq((1L, 7, 20)), leaks)
  }
}
