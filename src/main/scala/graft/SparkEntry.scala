package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, CoreSql, Q, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY §2 parity
  * surface + the training-data-pipeline extensions); `oracleSql`
  * carries the DuckDB-equivalent SQL for every oracle-checkable
  * entry. Column names/aliases match the oracle exactly (the
  * driver's compare hashes values under name-sorted columns).
  */
object SparkEntry {

  private val registry: Map[String, Q] =
    CoreSql.all ++ Analytics.all ++ TextOps.all ++ VectorOps.all ++ Map(
      // feature extraction IS oracle-checkable on its decode-verified
      // scalar slots: decoded dimensions and the decoder-route code
      // reproduce the generator's closed-form id arithmetic (float
      // codec statistics stay planted-truth-gated in MultimodalSpec)
      "q_mm_features" -> Q(
        """SELECT doc_id AS id,
                  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                       WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
                  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
                       WHEN 1 THEN 'wav' ELSE 'mjpeg' END AS format,
                  CAST(CASE doc_id % 3 WHEN 0 THEN 16 + (doc_id % 8) * 8
                                       WHEN 1 THEN 16000
                                       ELSE 16 + (doc_id % 4) * 8 END AS INT) AS d0,
                  CAST(CASE doc_id % 3 WHEN 0 THEN 16 + (doc_id % 5) * 8
                                       WHEN 1 THEN 800 + (doc_id % 10) * 80
                                       ELSE 16 + (doc_id % 3) * 8 END AS INT) AS d1,
                  CAST(CASE WHEN doc_id % 3 = 2 THEN 3 + (doc_id % 4) ELSE 0 END AS INT) AS d2,
                  CAST(doc_id % 3 + 1 AS INT) AS route
           FROM documents ORDER BY id""")(
        (s, d) => operators.Multimodal.pipeline(s, d)),
      // audio PCM chunking: WAV payload length is closed-form in the
      // id (44-byte header + 2 bytes/sample), so the every-4th-64-byte
      // frame table including the partial tail chunk is fully oracled
      "q_mm_frames" -> Q(
        """WITH a AS (SELECT doc_id AS id, 1644 + 160 * (doc_id % 10) AS len
                      FROM documents WHERE doc_id % 3 = 1)
           SELECT id, CAST(r.range AS INT) AS frame_idx,
                  CAST(LEAST(64, len - r.range * 64) AS INT) AS n_bytes
           FROM a CROSS JOIN range(0, 100, 4) r
           WHERE r.range * 64 < len
           ORDER BY id, frame_idx""")(
        (s, d) => operators.Multimodal.framesPipeline(s, d)),
      // video decode IS oracle-checkable: each decoded frame's raster
      // dimensions must reproduce the generator's closed-form (id →
      // w, h, nFrames) arithmetic, which DuckDB recomputes directly —
      // a broken MJPEG splitter or JPEG decode hash-fails
      "q_mm_video_frames" -> Q(
        """SELECT d.doc_id AS id, CAST(r.range AS INT) AS frame_idx,
                  CAST(16 + (d.doc_id % 4) * 8 AS INT) AS frame_w,
                  CAST(16 + (d.doc_id % 3) * 8 AS INT) AS frame_h
           FROM documents d CROSS JOIN range(7) r
           WHERE d.doc_id % 3 = 2 AND r.range < 3 + (d.doc_id % 4)
           ORDER BY id, frame_idx""")(
        (s, d) => operators.Multimodal.videoFramesPipeline(s, d)),
      // decode-coverage audit: per modality, every payload must have
      // taken its REAL decoder route (feature slot 8 carries the
      // route code 1/2/3; the byte-hash stub never writes one). The
      // oracle recomputes the corpus split from doc_id arithmetic —
      // a single undecodable payload flips decoded_ok and hash-fails.
      "q_mm_decode_audit" -> Q(
        """SELECT CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 'image'
                       WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
                  count(*) AS n, CAST(1 AS INT) AS decoded_ok
           FROM documents d GROUP BY 1 ORDER BY modality""")(
        (s, d) => operators.Multimodal.decodeAudit(s, d))
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q_groupby_q1").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
