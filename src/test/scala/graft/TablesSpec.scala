package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the table loaders — written after the round-11 incident
  * where the regenerated testdata switched events.ts from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and the loader's unconditional
  * ns→µs ÷1000 silently collapsed every event into January 1970
  * (4 red correctness rows, monotonic-so-joins-still-passed).
  *
  * Two defenses:
  *  1. unit-parity — a NANOS fixture (written with parquet-mr's example
  *     writer; Spark cannot emit NANOS) and a MICROS fixture (written
  *     by Spark) carrying the SAME instants must load to identical
  *     rows through Tables.t;
  *  2. epoch tripwire — every timestamp column of every loaded table
  *     must have min(ts) in the generator's documented epoch
  *     (year ≥ 2020). A unit error shrinks or inflates timestamps by
  *     1000× and lands centuries away, so this catches any future
  *     encoding drift even when downstream monotonic queries stay
  *     green.
  */
class TablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  // same instants, all within the generator's epoch (2021+), with
  // sub-millisecond digits so a silent µs↔ms↔ns confusion can't hide
  private val instantsMicros = Seq(
    1609459200000001L, // 2021-01-01 00:00:00.000001
    1640995200123456L, // 2022-01-01 00:00:00.123456
    1672531199999999L) // 2022-12-31 23:59:59.999999

  private def writeNanosFixture(dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val schema = Types.buildMessage()
      .addField(Types.required(INT64).named("event_id"))
      .addField(Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts"))
      .addField(Types.required(INT64).named("user_id"))
      .addField(Types.required(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.required(DOUBLE).named("value"))
      .addField(Types.required(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withType(schema)
      .build()
    try instantsMicros.zipWithIndex.foreach { case (us, i) =>
      val g = factory.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", us * 1000L) // nanos
      g.add("user_id", 100L + i)
      g.add("event_type", s"type_$i")
      g.add("value", i * 1.5)
      g.add("props", "{}")
      writer.write(g)
    } finally writer.close()
  }

  private def writeMicrosFixture(dir: String): Unit = {
    // Spark's TIMESTAMP_MICROS output matches the regenerated
    // testdata; capture/restore like the INT96 sibling so fixture
    // order can't leak writer conf into the shared session
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try writeMicrosFixtureAt(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  private def writeMicrosFixtureAt(dir: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    instantsMicros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, 100L + i, s"type_$i", i * 1.5, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def writeInt96Fixture(dir: String): Unit = {
    // the third encoding the generator could plausibly emit: legacy
    // INT96 (no logical-type annotation at all — the loader must take
    // the plain-read path, not the ns-division path)
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try writeMicrosFixtureAt(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  test("events loader yields identical rows for NANOS, MICROS, and INT96 parquet encodings") {
    val base = Files.createTempDirectory("tablespec").toString
    val nanosDir = s"$base/nanos"; val microsDir = s"$base/micros"; val int96Dir = s"$base/int96"
    Files.createDirectories(Paths.get(nanosDir))
    writeNanosFixture(nanosDir)
    writeMicrosFixture(microsDir)
    writeInt96Fixture(int96Dir)
    def load(dir: String): Seq[String] =
      Tables.t(spark, dir, "events")
        .selectExpr("event_id", "date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts",
          "user_id", "event_type", "value", "props")
        .collect().map(_.mkString("|")).toSeq.sorted
    val n = load(nanosDir); val m = load(microsDir); val i = load(int96Dir)
    assert(n.nonEmpty && n == m, s"NANOS vs MICROS mismatch:\n  nanos=$n\n  micros=$m")
    assert(i == m, s"INT96 vs MICROS mismatch:\n  int96=$i\n  micros=$m")
    // and the instants landed where they were planted, not in 1970
    assert(n.head.contains("2021-01-01 00:00:00.000001"), n.head)
  }

  test("epoch tripwire: every timestamp column in every table has min in the generator epoch (year >= 2020)") {
    assume(Files.exists(Paths.get(sfDir)))
    import org.apache.spark.sql.types.TimestampType
    for (name <- Tables.names) {
      val df = Tables.t(spark, sfDir, name)
      val tsCols = df.schema.fields.filter(_.dataType == TimestampType).map(_.name)
      for (c <- tsCols) {
        val minYear = df.selectExpr(s"year(min(`$c`))").head().getInt(0)
        assert(minYear >= 2020,
          s"$name.$c min year $minYear < 2020 — timestamp unit drift in the loader or testdata")
      }
    }
  }

  test("unit-memo fingerprint tracks the part file, not the directory (in-place rewrite invalidates)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fp").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "events.parquet").getAbsolutePath
    Seq((1L, "a")).toDF("event_id", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(path)
    val fp1 = Tables.datasetFingerprint(spark, path)
    assert(Tables.datasetFingerprint(spark, path) == fp1,
      "fingerprint must be stable while the data file is unchanged")
    // rewrite the part file IN PLACE: same file name, same directory —
    // only the file's own mtime (and possibly length) move. The old
    // directory-keyed memo missed exactly this case.
    val part = new java.io.File(dir, "events.parquet").listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .minBy(_.getName)
    val bytes = Files.readAllBytes(part.toPath)
    Files.write(part.toPath, bytes)
    assert(part.setLastModified(part.lastModified() + 5000))
    val fp2 = Tables.datasetFingerprint(spark, path)
    assert(fp2 != fp1,
      s"in-place part-file rewrite must change the fingerprint ($fp1)")
  }
}
