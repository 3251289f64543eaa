package graft.queries

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** tokens + distinct word-3-gram shingles per document. */
  private def ngDocs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .selectExpr(
        "doc_id", "source", "text",
        "filter(split(lower(text), '\\\\s+'), x -> x != '') AS toks")
      .selectExpr(
        "doc_id", "source", "toks",
        """CASE WHEN size(toks) >= 3 THEN
             array_distinct(transform(sequence(0, size(toks)-3),
               i -> concat(element_at(toks, i+1), ' ', element_at(toks, i+2), ' ', element_at(toks, i+3))))
           ELSE array() END AS ng""")

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

  private val langCase =
    """CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
            WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
            WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
            WHEN s_fr > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred"""

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
      """SELECT doc_id,
                md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
         FROM documents ORDER BY doc_id""") { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))).as("fp"))
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

    // ---- quality scoring --------------------------------------------------
    // Ratios are IEEE divisions of exact integers — bit-identical across
    // engines, no rounding tolerance needed.
    "q_text_quality" -> Q(
      s"""SELECT doc_id, n_tokens, mean_tok_len, punct_ratio, stop_ratio,
                 CASE WHEN n_tokens >= 10 AND n_tokens <= 2000 AND stop_ratio <= 0.5
                      THEN 'ok' ELSE 'low' END AS quality
          FROM (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS DOUBLE)
                     / greatest(len(toks), 1) AS mean_tok_len,
                   CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                     / greatest(length(text), 1) AS punct_ratio,
                   CAST(len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE)
                     / greatest(len(toks), 1) AS stop_ratio
            FROM (SELECT doc_id, text,
                    list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS toks
                  FROM documents))
          ORDER BY doc_id""") { (s, d) =>
      t(s, d, "documents")
        .selectExpr("doc_id", "text",
          "filter(split(lower(text), '\\\\s+'), x -> x != '') AS toks")
        .selectExpr(
          "doc_id",
          "CAST(size(toks) AS BIGINT) AS n_tokens",
          "CAST(aggregate(toks, 0L, (a, x) -> a + length(x)) AS DOUBLE) / greatest(size(toks), 1) AS mean_tok_len",
          "CAST(regexp_count(text, '[.,;:!?]') AS DOUBLE) / greatest(length(text), 1) AS punct_ratio",
          "CAST(size(filter(toks, x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE) / greatest(size(toks), 1) AS stop_ratio")
        .selectExpr("doc_id", "n_tokens", "mean_tok_len", "punct_ratio", "stop_ratio",
          "CASE WHEN n_tokens >= 10 AND n_tokens <= 2000 AND stop_ratio <= 0.5 THEN 'ok' ELSE 'low' END AS quality")
        .orderBy(col("doc_id"))
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
      t(s, d, "documents")
        .selectExpr("doc_id",
          "filter(split(lower(text), '\\\\s+'), x -> x != '') AS toks")
        .selectExpr("doc_id",
          "size(filter(toks, x -> x IN ('the','a','and','is','of'))) AS s_en",
          "size(filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de",
          "size(filter(toks, x -> x IN ('el','la','los','que','y'))) AS s_es",
          "size(filter(toks, x -> x IN ('le','les','et','des','une'))) AS s_fr")
        .selectExpr("doc_id", langCase)
        .orderBy(col("doc_id"))
    },

    // ---- exact n-gram Jaccard near-dup (inverted-index co-count) ----------
    "q_dedup_ngram" -> Q(
      s"""$ngCte,
          inv AS (SELECT doc_id, unnest(ng) AS sh FROM docs),
          sizes AS (SELECT doc_id, len(ng) AS n FROM docs),
          co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                 FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
          SELECT doc_a, doc_b, jaccard FROM (
            SELECT doc_a, doc_b,
                   CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
            FROM co JOIN sizes sa ON sa.doc_id = doc_a
                    JOIN sizes sb ON sb.doc_id = doc_b)
          WHERE jaccard >= 0.6 ORDER BY doc_a, doc_b""") { (s, d) =>
      val docs  = ngDocs(s, d).cache()
      val inv   = docs.select(col("doc_id"), explode(col("ng")).as("sh"))
      val sizes = docs.select(col("doc_id"), size(col("ng")).as("n"))
      val co = inv.as("a").join(inv.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      co.join(sizes.as("sa"), col("sa.doc_id") === col("doc_a"))
        .join(sizes.as("sb"), col("sb.doc_id") === col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (col("inter").cast("double") / (col("sa.n") + col("sb.n") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.6)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- MinHash + LSH near-dup (sub-quadratic scale path) ----------------
    // 16 minhashes over word-3-gram shingles, 4 bands × 4 rows; candidate
    // pairs from band-bucket equi-join, then exact Jaccard verification.
    // Engine-specific hashing (xxhash64) → rows-only check.
    "q_dedup_minhash" -> Q.noOracle { (s, d) =>
      // shingles + signature computed ONCE and cached; the band table,
      // candidate join, and both verification joins all reuse it (the
      // uncached version recomputed the shingle sets three times).
      val docs = ngDocs(s, d).filter(size(col("ng")) > 0)
        .selectExpr("doc_id", "ng",
          "transform(sequence(0, 15), j -> array_min(transform(ng, g -> xxhash64(g, j)))) AS sig")
        .cache()
      val bands = docs.selectExpr("doc_id",
        """posexplode(transform(sequence(0, 3), b -> xxhash64(
             element_at(sig, b*4+1), element_at(sig, b*4+2),
             element_at(sig, b*4+3), element_at(sig, b*4+4)))) AS (band, bh)""")
      val cand = bands.select(col("doc_id").as("doc_a"), col("band"), col("bh")).as("a")
        .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("bh")).as("b"),
          Seq("band", "bh"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      val ngById = docs.select(col("doc_id"), col("ng"))
      cand
        .join(ngById.select(col("doc_id").as("doc_a"), col("ng").as("ng_a")), Seq("doc_a"))
        .join(ngById.select(col("doc_id").as("doc_b"), col("ng").as("ng_b")), Seq("doc_b"))
        .selectExpr("doc_a", "doc_b",
          "size(array_intersect(ng_a, ng_b)) AS inter",
          "size(ng_a) + size(ng_b) AS tot")
        .selectExpr("doc_a", "doc_b",
          "CAST(inter AS DOUBLE) / (tot - inter) AS jaccard")
        .filter(col("jaccard") >= 0.6)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- SimHash near-dup -------------------------------------------------
    // 64-bit simhash from token hashes; 4×16-bit band buckets guarantee
    // (pigeonhole) that any pair within Hamming distance 3 shares a band.
    "q_dedup_simhash" -> Q.noOracle { (s, d) =>
      // hash each token ONCE, then fold the 64 bit-counters over the
      // precomputed hashes (hashing inside the per-bit loop costs
      // 64 × |toks| xxhash64 calls per document).
      val sim = t(s, d, "documents")
        .selectExpr("doc_id",
          "array_distinct(filter(split(lower(text), '\\\\s+'), x -> x != '')) AS toks")
        .filter(size(col("toks")) > 0)
        .selectExpr("doc_id", "transform(toks, x -> xxhash64(x)) AS th")
        .selectExpr("doc_id",
          """aggregate(transform(sequence(0, 63), i ->
               IF(aggregate(th, 0, (acc, h) ->
                    acc + IF((shiftright(h, i) & 1L) = 1L, 1, -1)) >= 0,
                  shiftleft(1L, i), 0L)),
             0L, (a, b) -> a | b) AS simhash""")
        .selectExpr("doc_id", "simhash",
          "posexplode(transform(sequence(0, 3), c -> shiftright(simhash, c*16) & 65535L)) AS (band, chunk)")
        .cache()
      sim.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"), col("band"), col("chunk")).as("a")
        .join(sim.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"), col("band"), col("chunk")).as("b"),
          Seq("band", "chunk"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("bit_count(sim_a ^ sim_b)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }
  )
}
