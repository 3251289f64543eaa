package graft

import org.apache.spark.sql.SparkSession
import graft.engine.{Engine, ResultSet}

/** Interactive SQL shell — the reference's REPL surface
  * (SQLLayer/sql_shell.cpp:79-152): statements accumulate until ';',
  * meta-commands `\q` (quit), `\s` (show tables), `\d <t>` (describe),
  * ASCII-table output with a `N row(s) in set (X ms)` trailer.
  */
object Shell {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = new Engine(spark)
    println("graft SQL shell — \\q quit, \\s show tables, \\d <table> describe, " +
      "\\spark <sql> full Spark SQL, \\explain <sql> tier feed + physical plan; " +
      "similarity search: SEARCH <table> NEAREST (v1, v2, ...) TOP k " +
      "[USING exact|lsh|ivf|ivfpq] [VECTOR col]")
    val in = scala.io.Source.stdin.getLines()
    val buf = new StringBuilder
    var done = false
    print("sql> "); Console.out.flush()
    while (!done && in.hasNext) {
      val line = in.next().trim
      if (line.startsWith("\\")) {
        line.split("\\s+").toList match {
          case "\\q" :: _          => done = true
          case "\\s" :: _          => render(engine.sql("SHOW TABLES"), 0L)
          case "\\d" :: t :: _     => render(engine.sql(s"DESCRIBE $t"), 0L)
          // extension surface: full Spark SQL over the live snapshots
          // (single-line; capped like the REST envelope) and the
          // Spark-dialect EXPLAIN (tier feed + Catalyst plan)
          case "\\spark" :: rest if rest.nonEmpty =>
            val t0 = System.nanoTime()
            try {
              // leaseless action — retry once on a lost cached block
              val (headers, rows) = engine.withBlockLossRetry {
                val df = engine.sparkSql(rest.mkString(" ").stripSuffix(";"))
                val hdrs = df.columns.toVector
                (hdrs, df.limit(1000).collect().toVector
                  .map(r => hdrs.indices.toVector.map(i => String.valueOf(r.get(i)))))
              }
              render(ResultSet(ok = true, headers, rows),
                (System.nanoTime() - t0) / 1000000L)
            } catch { case e: Exception => println(s"ERROR: ${e.getMessage}") }
          case "\\explain" :: rest if rest.nonEmpty =>
            try println(engine.explainSpark(rest.mkString(" ").stripSuffix(";")))
            catch { case e: Exception => println(s"ERROR: ${e.getMessage}") }
          case other               => println(s"unknown meta-command: ${other.mkString(" ")}")
        }
        if (!done) { print("sql> "); Console.out.flush() }
      } else {
        buf.append(line).append(' ')
        if (line.endsWith(";")) {
          val stmt = buf.toString.trim.stripSuffix(";")
          buf.clear()
          val t0 = System.nanoTime()
          val rs = engine.sql(stmt)
          render(rs, (System.nanoTime() - t0) / 1000000L)
          print("sql> "); Console.out.flush()
        }
      }
    }
    spark.stop()
  }

  private def render(rs: ResultSet, ms: Long): Unit = {
    if (!rs.ok) { println(s"ERROR: ${rs.error}"); return }
    if (rs.headers.nonEmpty) {
      val widths = rs.headers.indices.map { i =>
        (rs.headers(i).length +: rs.rows.map(_(i).length)).max
      }
      def line(cells: Vector[String]): String =
        cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString("| ", " | ", " |")
      val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
      println(sep); println(line(rs.headers)); println(sep)
      rs.rows.foreach(r => println(line(r)))
      println(sep)
      println(s"${rs.rowCount} row(s) in set ($ms ms)")
      if (rs.error.nonEmpty) println(s"WARNING: ${rs.error}")
    } else println(s"OK, ${rs.rowsAffected} row(s) affected ($ms ms)")
  }
}
