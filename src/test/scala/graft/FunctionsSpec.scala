package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, GraftFunctions}

/** Native Catalyst expressions (cosine_sim / dot_product): codegen
  * path (whole-stage enabled), interpreted path, SQL registration via
  * both the runtime registry and SparkSessionExtensions.
  */
class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cosine_sim and dot_product match reference math (codegen path)") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT cosine_sim(array(1D, 0D, 0D), array(0D, 1D, 0D)) AS orth,
                cosine_sim(array(1D, 2D, 3D), array(1D, 2D, 3D)) AS same,
                cosine_sim(array(1D, 2D, 3D), array(2D, 4D, 6D)) AS prop,
                cosine_sim(array(0D, 0D), array(1D, 1D)) AS zero,
                dot_product(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS dp""").collect()(0)
    assert(row.getDouble(0) == 0.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
    assert(row.getDouble(3) == 0.0)
    assert(row.getDouble(4) == 32.0)
  }

  test("interpreted eval agrees with codegen") {
    GraftFunctions.register(spark)
    val df = spark.sql("SELECT cosine_sim(array(3D, -1D, 2D), array(1D, 4D, -2D)) AS c")
    val viaCodegen = df.collect()(0).getDouble(0)
    val expected = {
      val a = Seq(3.0, -1.0, 2.0); val b = Seq(1.0, 4.0, -2.0)
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    assert(math.abs(viaCodegen - expected) < 1e-12)
    // interpreted path: same expression evaluated without codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = spark.sql("SELECT cosine_sim(array(3D, -1D, 2D), array(1D, 4D, -2D)) AS c")
        .collect()(0).getDouble(0)
      assert(viaEval == viaCodegen)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("cosine_argmax matches a naive reference over random vectors, ties, and both eval paths") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(71L)
    val dim = 16
    val cents = (0 until 7).map(c => (c * 10L, Seq.fill(dim)(rng.nextGaussian())))
    // random rows + exact duplicates of two centroids (cos=1 with a
    // tie against the scaled copy below) + a scaled copy of centroid 0
    // (cosine exactly 1 with cid 0 AND cid 70 if both present)
    val rows = (0 until 40).map(i => (i.toLong, Seq.fill(dim)(rng.nextGaussian()))) ++
      Seq((100L, cents(0)._2), (101L, cents(3)._2),
          (102L, cents(0)._2.map(_ * 2.5)))
    def naive(v: Seq[Double]): Long = {
      val nv = math.sqrt(v.map(x => x * x).sum)
      cents.map { case (cid, cv) =>
        val dot = v.zip(cv).map { case (x, y) => x * y }.sum
        (cid, dot / (nv * math.sqrt(cv.map(x => x * x).sum)))
      }.sortBy { case (cid, cos) => (-cos, cid) }.head._1
    }
    val lit = org.apache.spark.sql.functions.typedlit(cents)
    def run(): Map[Long, Long] = rows.toDF("id", "v")
      .select($"id", org.apache.spark.sql.functions.call_function(
        "cosine_argmax", $"v", lit).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run()
    rows.foreach { case (id, v) =>
      assert(got(id) == naive(v), s"row $id: kernel ${got(id)} != naive ${naive(v)}")
    }
    // interpreted path must agree bit-for-bit with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == got)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("expression eval works standalone and extensions inject cleanly") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // direct expression eval — no session, no codegen
    def arr(xs: Double*) =
      Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(DoubleType))
    val c = graft.functions.CosineSim(arr(1, 2, 2), arr(2, 4, 4)).eval(null)
    assert(math.abs(c.asInstanceOf[Double] - 1.0) < 1e-12)
    val d = graft.functions.DotProduct(arr(1, 2), arr(3, 4)).eval(null)
    assert(d.asInstanceOf[Double] == 11.0)
    // injection applies without error (a genuinely fresh session would
    // be needed to observe it through SQL; getOrCreate in a shared
    // test JVM reuses the existing one)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("topk_struct keeps the k smallest per group across partition merges") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // 10k rows over 3 groups, spread across partitions so partial
    // heaps must serialize and merge
    val df = (1 to 10000).map(i => (i % 3, i)).toDF("g", "v").repartition(8)
    df.createOrReplaceTempView("tk")
    val got = spark.sql(
      """SELECT g, t.v FROM (
           SELECT g, explode(topk_struct(struct(v), 2)) AS t FROM tk GROUP BY g)
         ORDER BY g, t.v""").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    // smallest two v per residue class: g=0 -> 3,6; g=1 -> 1,4; g=2 -> 2,5
    assert(got == Seq((0, 3), (0, 6), (1, 1), (1, 4), (2, 2), (2, 5)))
  }

  test("heavy_hitters honors the Misra-Gries guarantees under merge with k << vocab") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // zipf-ish stream: 5 genuinely heavy tokens + 2000 singleton-ish
    // tail tokens, spread across 8 partitions so partial sketches hit
    // BOTH the decrement-all path (vocab >> k within a partition) and
    // the merge trim (8 partials of <= k entries each)
    val rows = (1 to 5).flatMap(h => Seq.fill(1000 * h)(s"heavy$h")) ++
      (1 to 2000).flatMap(t => Seq.fill(3)(s"tail$t"))
    val n = rows.size
    val k = 20
    val df = scala.util.Random.shuffle(rows).toDF("tok").repartition(8)
    df.createOrReplaceTempView("hh")
    val sketch = spark.sql(s"SELECT explode(heavy_hitters(tok, $k)) AS h FROM hh")
      .select("h.tok", "h.est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= k, s"sketch kept ${sketch.size} > k=$k entries")
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n.toDouble / (k + 1)
    // coverage: every token with tf > n/(k+1) must be present
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(sketch.contains(t), s"heavy token $t (tf=${exact(t)}) missing from sketch")
    }
    // underestimate + bounded error for every surviving entry
    sketch.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overestimated: $est > ${exact(t)}")
      assert(exact(t) - est <= bound, s"$t undercount ${exact(t) - est} > $bound")
    }
  }

  test("bloom_agg/bloom_contains: zero false negatives, fp rate under the sizing target") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // 10k inserted keys across 8 partitions (partial blooms OR-merge),
    // 29 bits/item sizing (fpp ~1e-6)
    (0L until 10000L).toDF("h").repartition(8).createOrReplaceTempView("bf_in")
    (100000L until 120000L).toDF("h").createOrReplaceTempView("bf_probe")
    val found = spark.sql(
      """SELECT count(*) FROM bf_in
         WHERE bloom_contains((SELECT bloom_agg(h, 10000L, 290000L) FROM bf_in), h)""")
      .head().getLong(0)
    assert(found == 10000L, s"false negatives: only $found/10000 inserted keys found")
    val fps = spark.sql(
      """SELECT count(*) FROM bf_probe
         WHERE bloom_contains((SELECT bloom_agg(h, 10000L, 290000L) FROM bf_in), h)""")
      .head().getLong(0)
    // 20k disjoint probes at fpp 1e-6: expected ~0.02 false positives;
    // allow 5 before calling the sizing broken
    assert(fps <= 5, s"$fps false positives in 20k probes at 29 bits/item")
  }

  test("null inputs yield null, not a crash") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT cosine_sim(CAST(NULL AS array<double>), array(1D)) AS c").collect()(0)
    assert(r.isNullAt(0))
  }

  test("int8_scale/int8_round match the higher-order forms element-for-element") {
    GraftFunctions.register(spark)
    // includes a saturating max, negatives, an exact .5 quotient via
    // scale = 1 (max=127), and the all-zero vector (scale floor)
    val rows = spark.sql(
      """SELECT v,
                int8_scale(v) AS ks,
                greatest(array_max(transform(v, x -> abs(x))) / 127, 1e-300) AS hs,
                int8_round(v, int8_scale(v)) AS kq,
                transform(v, x -> CAST(round(x / greatest(array_max(transform(v, x -> abs(x))) / 127, 1e-300)) AS INT)) AS hq
         FROM VALUES (array(127.0D, -127.0D, 63.5D, -63.5D, 0.1D, 0.0D)),
                     (array(0.0D, 0.0D, 0.0D)),
                     (array(-3.2D, 2.7D, 1e-9D)) AS t(v)""").collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"scale mismatch: $r")
      assert(r.getSeq[Int](3) == r.getSeq[Int](4), s"round mismatch: $r")
    }
    // codegen vs interpreted agreement for the kernels themselves
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(127.0, -63.5, 0.3))
    assert(graft.functions.VectorKernels.int8Scale(arr) == 1.0)
    assert(graft.functions.VectorKernels.int8Round(arr, 1.0).toIntArray().toSeq ==
      Seq(127, -64, 0))   // -63.5 rounds half AWAY from zero
  }

  test("nfc/nfkc normalization kernels follow UAX #15 exactly") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val decomposed = "Café"          // e + combining acute
    val composed   = "Café"           // precomposed é
    val ligature   = "ﬁnal"           // fi ligature
    val rows = Seq(decomposed, composed, ligature, "ascii", null)
      .toDF("s")
      .selectExpr("s", "nfc_normalize(s) AS nfc", "nfkc_normalize(s) AS nfkc")
      .collect()
    assert(rows(0).getString(1) == composed, "NFC must compose combining marks")
    assert(rows(1).getString(1) == composed, "NFC is a no-op on composed input")
    // the contrast case the oracle can't cover (DuckDB has no NFKC):
    // NFC preserves compatibility ligatures, NFKC folds them
    assert(rows(2).getString(1) == ligature)
    assert(rows(2).getString(2) == "final")
    assert(rows(3).getString(1) == "ascii" && rows(3).getString(2) == "ascii")
    assert(rows(4).isNullAt(1) && rows(4).isNullAt(2))
    // idempotence: normalize twice == normalize once
    val twice = Seq(decomposed).toDF("s")
      .selectExpr("nfc_normalize(nfc_normalize(s)) AS a", "nfc_normalize(s) AS b")
      .collect()(0)
    assert(twice.getString(0) == twice.getString(1))
  }

  // The q_agg_approx_distinct gate, repeated at every available scale
  // factor: HLL++ with the default rsd=0.05 must land within 3 sigma
  // (15%) of the exact distinct count. A broken sketch registration
  // (or a silently-changed default rsd) fails here on data of any
  // size, not just the verify-gate SF.
  test("mask_pii is byte-exact to the two-pass regex composition (adversarial + random)") {
    GraftFunctions.register(spark)
    import org.apache.spark.unsafe.types.UTF8String
    def reference(s: String): String =
      s.replaceAll("[a-zA-Z0-9._]+@[a-zA-Z0-9.]+", "<EMAIL>")
        .replaceAll("[0-9]+", "<NUM>")
    def kernel(s: String): String =
      graft.functions.TextKernels.maskPii(UTF8String.fromString(s)).toString
    val adversarial = Seq(
      "", "@", "@@", "a@", "@a", "a@b", "a@b@c", "ab@@c", "x@ y",
      "1@2", "12x@y34", "1 2@x", "...@x", "_@.", "a.b_c@d.e.f",
      "no masks here", "123", "a1b2c3", "tail digits 42", "42 leading",
      "email end x@y", "x@y.z 99 a@b", "<EMAIL> 7 <NUM>",
      "dots..everywhere..@..too..", "ünïcödé 42 ü@x mixé",   // multi-byte bytes pass through
      "é@é", "áb@c", "𝟙23@x",                 // non-ASCII digits/letters are NOT class members
      "a@b.c.d.e.f.g.h 00123 _x_@9")
    adversarial.foreach { s =>
      assert(kernel(s) == reference(s),
        s"mask_pii diverged on ${s.map(c => f"$c%c(${c.toInt}%04x)").mkString}")
    }
    // randomized differential: strings over the interacting alphabet
    val rng = new scala.util.Random(42)
    val alphabet = "ab19._@ @é"
    (0 until 2000).foreach { _ =>
      val s = Seq.fill(rng.nextInt(24))(alphabet(rng.nextInt(alphabet.length))).mkString
      assert(kernel(s) == reference(s), s"mask_pii diverged on '$s'")
    }
    // the registered SQL function runs the same kernel (codegen path)
    import spark.implicits._
    val got = Seq("a@b 12", "x 7 y@z.w").toDF("s")
      .selectExpr("mask_pii(s) AS m").collect().map(_.getString(0)).toSeq
    assert(got == Seq("<EMAIL> <NUM>", "x <NUM> <EMAIL>"), got.toString)
  }

  test("approx_count_distinct stays inside the 3-sigma HLL band at every SF") {
    import org.apache.spark.sql.functions.{abs => _, _}
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      assume(java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
      val row = graft.Tables.t(spark, dir, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("ex"),
             approx_count_distinct(col("l_partkey")).as("ap"))
        .collect()(0)
      val ex = row.getLong(0); val ap = row.getLong(1)
      val rel = math.abs(ap.toDouble / ex - 1.0)
      assert(rel <= 0.15, s"$sf: exact=$ex approx=$ap rel=$rel")
    }
  }

  test("pq_encode: argmin per subspace, tie to lowest cid, loud on bad shapes") {
    GraftFunctions.register(spark)
    // 4-dim vector, 2 subspaces of 2; codebook rows chosen so each
    // subspace picks a DIFFERENT centroid: v=[1,1,9,9] is nearest
    // cid 0 ([1,1,0,0]) in subspace 0 and cid 1 ([0,0,9,9]) in 1
    val row = spark.sql(
      """SELECT pq_encode(array(1, 1, 9, 9),
           array(named_struct('cid', 0L, 'cv', array(1, 1, 0, 0)),
                 named_struct('cid', 1L, 'cv', array(0, 0, 9, 9))), 2) AS pc""").head()
    val pc = row.getSeq[org.apache.spark.sql.Row](0)
    assert(pc.map(r => (r.getLong(0), r.getLong(1))) == Seq((0L, 0L), (1L, 0L)), pc)

    // exact tie (two identical codebook rows) resolves to the LOWEST
    // cid — the ascending-literal contract shared with the oracle
    val tie = spark.sql(
      """SELECT pq_encode(array(5, 5),
           array(named_struct('cid', 3L, 'cv', array(5, 5)),
                 named_struct('cid', 7L, 'cv', array(5, 5))), 1) AS pc""").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(tie.map(_.getLong(0)) == Seq(3L), tie)

    // vector dim not divisible by m, vector/codebook dim mismatch,
    // ragged codebooks, and out-of-order / duplicate-cid codebooks
    // (which would break the lowest-cid tie rule) must all fail
    // loudly, never mis-assign
    for (bad <- Seq(
      "SELECT pq_encode(array(1, 2, 3), array(named_struct('cid', 0L, 'cv', array(1, 2, 3))), 2)",
      "SELECT pq_encode(array(1, 2), array(named_struct('cid', 0L, 'cv', array(1, 2, 3))), 1)",
      """SELECT pq_encode(array(1, 2), array(named_struct('cid', 0L, 'cv', array(1, 2)),
           named_struct('cid', 1L, 'cv', array(1))), 1)""",
      """SELECT pq_encode(array(5, 5), array(named_struct('cid', 7L, 'cv', array(5, 5)),
           named_struct('cid', 3L, 'cv', array(5, 5))), 1)""",
      """SELECT pq_encode(array(5, 5), array(named_struct('cid', 3L, 'cv', array(5, 5)),
           named_struct('cid', 3L, 'cv', array(6, 6))), 1)""")) {
      val e = intercept[Exception](spark.sql(bad).collect())
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("pq_encode")), e.toString)
    }
  }
}
