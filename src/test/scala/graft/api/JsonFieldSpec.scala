package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit precision for the flat-JSON integer extractor behind the
  * optimize endpoint's part_bytes contract: the digits must END the
  * value — numeric-PREFIX garbage truncating to a tiny part size is
  * exactly the failure the anchored regex exists to prevent.
  */
class JsonFieldSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private lazy val srv = new ApiServer(new graft.engine.Engine(spark))

  private def f(body: String): Option[Long] = srv.jsonLongField(body, "part_bytes")

  test("jsonLongField accepts bare and quoted integers, ends at the digits") {
    assert(f("""{"part_bytes": 32768}""") == Some(32768L))
    assert(f("""{"part_bytes": "32768"}""") == Some(32768L))
    assert(f("""{"part_bytes": 32768, "x": 1}""") == Some(32768L))
    assert(f("""{"part_bytes":-1}""") == Some(-1L)) // engine rejects; parse succeeds
    // numeric-prefix garbage must NOT silently truncate
    assert(f("""{"part_bytes": 1e6}""").isEmpty, "1e6 must not parse as 1")
    assert(f("""{"part_bytes": 32768.5}""").isEmpty, "floats must not truncate")
    assert(f("""{"part_bytes": "32kb"}""").isEmpty, "units must not truncate")
    assert(f("""{"part_bytes": "lots"}""").isEmpty)
    assert(f("""{"other": 5}""").isEmpty)
    // mixed quote forms don't cross-match
    assert(f("""{"part_bytes": "32768}""").isEmpty, "unterminated quote")
  }

  test("jsonHasKey matches key position only, never inside string values") {
    def h(body: String): Boolean = srv.jsonHasKey(body, "part_bytes")
    assert(h("""{"part_bytes": 1}"""))
    assert(h("""{"a":1,"part_bytes":"x"}"""))
    assert(h("""{ "part_bytes" : null }"""))
    // the literal as a VALUE is not presence
    assert(!h("""{"table":"part_bytes"}"""))
    // the key-colon SHAPE inside a string value is not presence — the
    // bare key-colon regex false-positived on exactly this
    assert(!h("""{"table":"t","note":"set \"part_bytes\": later"}"""))
    assert(!h("""{"x":"\"part_bytes\":1"}"""))
    assert(!h("""{"other": 5}"""))
    assert(!h("""{"part_bytes_extra": 5}"""))
    // malformed (unterminated string) reads as absent, not a crash
    assert(!h("""{"part_bytes"""))
  }
}
