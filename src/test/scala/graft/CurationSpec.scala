package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-truth gates for the round-12 curation additions. The
  * DuckDB oracles prove Spark and DuckDB agree; these fixtures prove
  * the agreed-on thing is the RIGHT thing:
  *
  *  - q_gopher_rules: one hand-built violator per rule, each failing
  *    EXACTLY its own rule and nothing else;
  *  - q_dsir_weights: docs written purely in the target slice's
  *    vocabulary must score positive, pure off-target vocabulary
  *    negative, and a mixed doc must land strictly between;
  *  - q_cluster_balance: an oversized cluster is capped (kept set
  *    reproduced from the same md5 arithmetic), a small cluster is
  *    kept whole — `hash % n_c < cap` is vacuously true when
  *    n_c <= cap.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def writeDocs(docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curationspec").toString
    docs.map { case (id, text, lang) => (id, text, lang, "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("Gopher rules: each planted violator fails exactly its own rule") {
    // 60 ordinary words incl. the required stops — passes everything
    val good = ("the of and " + (1 to 57).map(i => s"word$i").mkString(" "))
    // 30 words only — word-count rule
    val short = ("the of " + (1 to 28).map(i => s"word$i").mkString(" "))
    // mean word length ~2 — mwl rule (stops present, count ok)
    val terse = ("the of " + Seq.fill(58)("ab").mkString(" "))
    // 13 pure-digit words of 60 (alpha 47/60 < 0.8) — alpha rule
    // (12/60 would sit exactly ON the >= 0.8 boundary and pass)
    val nums = ("the of and " + (1 to 44).map(i => s"word$i").mkString(" ")
      + " " + Seq.fill(13)("12345").mkString(" "))
    // 8 symbol-bearing words of 60 (13% > 10%) — symbol rule; the
    // words keep a letter so the alpha rule still passes
    val symb = ("the of and " + (1 to 49).map(i => s"word$i").mkString(" ")
      + " " + Seq.fill(8)("a###b").mkString(" "))
    // no required stopword at all — stop rule
    val stopless = (1 to 60).map(i => s"word$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, good, "en"), (2L, short, "en"), (3L, terse, "en"),
      (4L, nums, "en"), (5L, symb, "en"), (6L, stopless, "en")))
    val rows = SparkEntry.queries("q_gopher_rules")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getInt(6))).toMap
    assert(rows(1L)._6 == 1, s"good doc must keep: ${rows(1L)}")
    assert(rows(2L)._6 == 0 && rows(2L)._1 == 30, s"short: ${rows(2L)}")
    assert(rows(3L)._6 == 0 && rows(3L)._2 < 3.0, s"terse mwl: ${rows(3L)}")
    assert(rows(4L)._6 == 0 && rows(4L)._4 < 0.8, s"nums alpha: ${rows(4L)}")
    assert(rows(5L)._6 == 0 && rows(5L)._3 > 0.1 && rows(5L)._4 >= 0.8,
      s"symb must fail ONLY the symbol rule: ${rows(5L)}")
    assert(rows(6L)._6 == 0 && rows(6L)._5 == 0, s"stopless: ${rows(6L)}")
    // every violator fails its own rule and no unintended one: the
    // measured stats of the good doc clear every threshold
    val g = rows(1L)
    assert(g._1 >= 50 && g._2 >= 3 && g._2 <= 10 && g._3 <= 0.1 &&
      g._4 >= 0.8 && g._5 >= 2, s"good doc stats: $g")
  }

  test("char entropy: empty and whitespace-only documents tokenize safely") {
    val dir = writeDocs(Seq(
      (1L, "", "en"), (2L, "   ", "en"), (3L, "aabb", "en")))
    val rows = SparkEntry.queries("q_text_entropy")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // an empty doc splits to [""] — the empty-string 'char' is filtered
    // on BOTH engines, so the doc has no char rows and emits no row
    // (rather than counting "" as an alphabet symbol)
    assert(!rows.contains(1L), s"empty doc must not emit a row: $rows")
    // whitespace-only: one symbol type (space) over 3 chars -> H = 0
    assert(rows(2L) == ((3L, 0.0)), s"whitespace doc: ${rows(2L)}")
    // two symbols at equal mass -> H = ln 2 (within the micro-nat grid)
    assert(rows(3L)._1 == 4L &&
      math.abs(rows(3L)._2 - math.log(2)) < 1e-5, s"aabb doc: ${rows(3L)}")
  }

  test("DSIR weights: target-vocabulary docs score positive, off-target negative, mixed between") {
    // target slice (lang=en) writes with vocabulary aX, off-target
    // (lang=xx) with vocabulary bX; the scorer never sees the labels
    // of the scored docs, only the two corpus-level count tables
    // corpora must be large enough that real counts dominate the
    // 4096-bucket add-one smoothing mass — with 40-token docs the
    // smoothing flattens the target model below raw and even pure
    // target text scores negative (observed), which is the correct
    // DSIR behavior for under-observed targets, not what this gate
    // pins
    val aText = (1 to 400).map(i => s"a${i % 10}").mkString(" ")
    val bText = (1 to 400).map(i => s"b${i % 10}").mkString(" ")
    val mixed = ((1 to 200).map(i => s"a${i % 10}") ++ (1 to 200).map(i => s"b${i % 10}")).mkString(" ")
    val dir = writeDocs(Seq(
      (1L, aText, "en"), (2L, aText, "en"), (3L, aText, "en"),
      (4L, bText, "xx"), (5L, bText, "xx"), (6L, bText, "xx"),
      (7L, mixed, "xx")))
    val rows = SparkEntry.queries("q_dsir_weights")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    assert(rows(1L)._1 > 0 && rows(1L)._3 == 1, s"target doc: ${rows(1L)}")
    assert(rows(4L)._1 < 0 && rows(4L)._3 == 0, s"off-target doc: ${rows(4L)}")
    assert(rows(7L)._2 > rows(4L)._2 && rows(7L)._2 < rows(1L)._2,
      s"mixed doc must land between: ${rows(4L)._2} < ${rows(7L)._2} < ${rows(1L)._2}")
  }

  test("classifier train step: target-only buckets get positive gradient, off-target negative, exact update") {
    // disjoint vocabularies: aX tokens appear only in lang='en' docs
    // (label 1), bX only in lang='xx' docs (label 0). For a y=1 doc the
    // residual y − σ(score) is strictly positive, for y=0 strictly
    // negative — so every bucket touched ONLY by target docs must
    // carry a positive gradient and every off-target-only bucket a
    // negative one (bucket collisions between the two vocabularies are
    // excluded via the same md5 arithmetic).
    val aText = (1 to 200).map(i => s"a${i % 13}").mkString(" ")
    val bText = (1 to 200).map(i => s"b${i % 13}").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, aText, "en"), (2L, aText, "en"), (3L, bText, "xx"), (4L, bText, "xx")))
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (BigInt(hex.substring(0, 15), 16) % 4096).toLong
    }
    val aB = (0 until 13).map(i => bucket(s"a$i")).toSet
    val bB = (0 until 13).map(i => bucket(s"b$i")).toSet
    val rows = SparkEntry.queries("q_classifier_train_step")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == (aB | bB), s"buckets: ${rows.keySet} vs ${aB | bB}")
    (aB -- bB).foreach { b => assert(rows(b)._2 > 0, s"target bucket $b: ${rows(b)}") }
    (bB -- aB).foreach { b => assert(rows(b)._2 < 0, s"off-target bucket $b: ${rows(b)}") }
    assert((aB -- bB).nonEmpty && (bB -- aB).nonEmpty, "fixture collided entirely")
    // the update rule is exactly w_old + grad / n_docs (4 docs)
    rows.values.foreach { case (wOld, grad, wNew) =>
      assert(wNew == wOld + grad.toDouble / 4L, s"update: $wOld $grad $wNew")
    }
  }

  test("multi-epoch classifier training reaches perfect separation on disjoint vocabularies") {
    // same disjoint-vocabulary construction as the single-step test:
    // after one update the target buckets carry strongly positive
    // weights and the off-target buckets strongly negative ones
    // (gradient magnitudes dwarf the [-1e6,1e6] stand-in init), so
    // epochs 2 and 3 must classify all four docs correctly; the
    // weight-mass trajectory must be an exact integer record
    val aText = (1 to 200).map(i => s"a${i % 13}").mkString(" ")
    val bText = (1 to 200).map(i => s"b${i % 13}").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, aText, "en"), (2L, aText, "en"), (3L, bText, "xx"), (4L, bText, "xx")))
    val rows = SparkEntry.queries("q_classifier_train")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3), rows.toSeq)
    assert(rows.forall(_._3 == 4L), s"n_docs: ${rows.toSeq}")
    assert(rows(1)._2 == 4L && rows(2)._2 == 4L,
      s"epochs 2 and 3 must separate perfectly: ${rows.toSeq}")
    // L1 mass grows as the separating weights strengthen
    assert(rows(2)._5 > rows(0)._5, s"w_l1 trajectory: ${rows.toSeq}")
  }

  test("cluster balance caps the oversized cluster via the exact hash set, keeps small clusters whole") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curationspec").toString
    // centroids at vec_id 0 and 53 (the % 53 == 0 codebook rule);
    // cluster A: 16 vectors near [1,0,0,0]; cluster B: 5 near [0,1,0,0]
    val aIds = Seq(0L) ++ (1L to 15L)
    val bIds = Seq(53L) ++ (54L to 57L)
    val rowsIn =
      aIds.map(id => (id, Array(1f, 0.01f * (id % 7), 0f, 0f), 0)) ++
      bIds.map(id => (id, Array(0f, 1f, 0.01f * (id % 5), 0f), 1))
    rowsIn.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("q_cluster_balance")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byCluster = out.groupBy(_._2)
    assert(byCluster.keySet == Set(0L, 53L), byCluster.keySet)
    assert(byCluster(0L).map(_._1).toSet == aIds.toSet, "assignment A")
    assert(byCluster(53L).map(_._1).toSet == bIds.toSet, "assignment B")
    // N=21, k=2 -> cap = ceil(21/4) = 6
    val cap = 6L
    def hash60(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    // small cluster: n_c = 5 <= cap -> hash % 5 < 6 always -> all kept
    assert(byCluster(53L).forall(_._4 == 1), byCluster(53L).toSeq)
    // big cluster: kept set is EXACTLY the md5-derived membership
    val expectKeep = aIds.filter(id => hash60(id) % 16 < cap).toSet
    val gotKeep = byCluster(0L).filter(_._4 == 1).map(_._1).toSet
    assert(gotKeep == expectKeep, s"got $gotKeep expected $expectKeep")
    assert(gotKeep.size < aIds.size, "the oversized cluster must actually shrink")
  }

  test("temperature mixture flattens: small source upsamples, big source downsamples") {
    // source masses 100 vs 10000 chars (two docs each): α=0.5 gives
    // a-weights 1:10, so rates (a_i/Σa)·(T/m_i) = 9.18 and 0.918 —
    // the small source must emit >1 copy/doc, the big one <1 on
    // average, and total output mass stays ≈ corpus mass
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curationspec").toString
    Seq((1L, "a" * 50, "src1"), (2L, "a" * 50, "src1"),
        (3L, "a" * 5000, "src2"), (4L, "a" * 5000, "src2"))
      .map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_mix_temperature")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val rateSmall = rows.find(_._2 == "src1").map(_._3)
    val rateBig = rows.find(_._2 == "src2").map(_._3)
    assert(rateSmall.exists(_ > 1000000L), s"small-source rate $rateSmall must upsample")
    assert(rateBig.forall(_ < 1000000L), s"big-source rate $rateBig must downsample")
    // exact expected rates: a = (round(1e6·√100), round(1e6·√10000)) = (1e7, 1e8)/10
    // rate_small = (1e7/1.1e8)·(10100/100) = 9.1818...; micro-rounded
    assert(rateSmall.contains(9181818L), rateSmall)
    assert(rateBig.contains(918182L), rateBig)
  }

  test("BM25: term coverage beats saturated tf, self and no-match docs excluded") {
    // doc 7 is one of the fixed query docs — its 3 tokens are the
    // query. doc 1 covers all three terms (two of them rare), doc 4
    // repeats the common term (tf saturation), doc 2 has one common
    // term, doc 3 matches nothing.
    val dir = writeDocs(Seq(
      (7L, "alpha beta gamma", "en"),
      (1L, "alpha beta gamma fill1 fill2", "en"),
      (2L, "alpha fill1 fill2 fill3 fill4", "en"),
      (3L, "fill1 fill2 fill3", "en"),
      (4L, "alpha alpha alpha alpha fill1", "en")))
    val rows = SparkEntry.queries("q_bm25_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.forall(_._1 == 7L), rows.toSeq)           // only qid 7 has terms
    assert(rows.map(_._3).toSeq == Seq(1L, 4L, 2L), rows.toSeq) // coverage > tf > single hit
    assert(!rows.exists(_._3 == 7L), "query doc must not retrieve itself")
    assert(!rows.exists(_._3 == 3L), "zero-overlap doc must not appear")
    // scores strictly descend with rank (distinct planted profiles)
    assert(rows.sortBy(_._2).map(_._4).sliding(2).forall(p => p(0) > p(1)), rows.toSeq)
  }
}
