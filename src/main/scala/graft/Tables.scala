package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). All queries receive the sf directory at call
  * time; nothing is cached so each query re-reads with its own
  * pushed-down filters/projections.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The generator has shipped events.ts as both TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects at schema inference) and
    * TIMESTAMP(MICROS) (plain-readable) across regenerations, so the
    * loader decides per file: read the column's logical-type unit from
    * the parquet footer and take the raw-int64 + ns→µs truncation path
    * ONLY for NANOS. Assuming one fixed unit is how round 11 lost four
    * correctness rows — a ÷1000 applied to micros collapses every
    * event into January 1970 (see SURVEY §2.12).
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    if (tsIsNanosCached(spark, path)) {
      import org.apache.spark.sql.types._
      // NANOS: a user-supplied LongType schema reads the raw nanos —
      // no session-wide legacy conf mutation — and truncates to
      // microseconds (identical to DuckDB's ns→µs truncation, so
      // oracle parity holds).
      val sch = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      spark.read.schema(sch).parquet(path)
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(path)
  }

  /** [[tsIsNanos]] memoized per data-file fingerprint — the unit of a
    * parquet file cannot change while its fingerprint is unchanged, so
    * the footer open happens once per DATASET, not once per plan
    * build. The unmemoized footer read cost ~0.2 s per query on every
    * events-table plan (the r12 q_lww_tombstone drift, adjudicated in
    * SURVEY §2.13); the whole per-plan cost now is resolving the data
    * file (one file status, plus one listing for a directory — whose
    * statuses already carry the mtime/length the key needs, so no
    * further round-trip). The fingerprint is taken on the FIRST PART
    * FILE (the
    * one [[tsIsNanos]] actually opens), not the dataset directory: a
    * directory's own mtime does not change when a child part file is
    * rewritten in place, so a directory-keyed memo could serve a stale
    * NANOS/MICROS decision until JVM restart. A regenerated dataset
    * changes the part file's mtime/length (or its name) and re-reads,
    * and TablesSpec's epoch tripwire backstops any unit drift this
    * misses.
    */
  private val unitMemo = scala.collection.concurrent.TrieMap.empty[String, Boolean]
  private def tsIsNanosCached(spark: SparkSession, path: String): Boolean = {
    unitMemo.getOrElseUpdate(datasetFingerprint(spark, path),
      tsIsNanos(spark, path))
  }

  /** Memo key for [[tsIsNanosCached]]: path + name/mtime/length of the
    * data file the footer probe opens. Package-private for spec
    * coverage (an in-place part-file rewrite must change the key).
    */
  private[graft] def datasetFingerprint(spark: SparkSession, path: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val st = resolveDataFile(conf, path)
    s"$path:${st.getPath.getName}:${st.getModificationTime}:${st.getLen}"
  }

  /** The concrete parquet file backing `path` — its FileStatus, so
    * fingerprinting spends no extra round-trip beyond resolution
    * itself (one getFileStatus for a file path; plus one listStatus
    * for a directory, whose returned statuses carry mtime/length).
    */
  private def resolveDataFile(conf: org.apache.hadoop.conf.Configuration,
                              path: String): org.apache.hadoop.fs.FileStatus = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p)
        .filter(f => !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        .sortBy(_.getPath.getName).headOption
        .getOrElse(sys.error(s"no parquet part files under $path"))
    else st
  }

  /** True iff the parquet footer annotates `ts` as TIMESTAMP(NANOS).
    * One footer read per dataset fingerprint (see [[tsIsNanosCached]]);
    * INT96 and MICROS/MILLIS encodings return false and take the plain
    * reader. Works on a single file or a directory of part files.
    */
  private def tsIsNanos(spark: SparkSession, path: String): Boolean = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    val file = resolveDataFile(conf, path).getPath
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      import scala.jdk.CollectionConverters._
      val schema = reader.getFileMetaData.getSchema
      schema.getFields.asScala.find(_.getName == "ts").exists(
        _.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            ts.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        })
    } finally reader.close()
  }

  /** Register all tables as temp views (used by SQL-string queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
