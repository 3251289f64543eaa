package graft
import org.apache.spark.sql.SparkSession
object TsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    df.printSchema()
    df.selectExpr("min(ts)", "max(ts)", "min(cast(ts as long))").show(false)
    val df2 = Tables.t(spark, "/root/testdata/sf0.01", "events")
    df2.printSchema()
    df2.selectExpr("min(ts)", "max(ts)").show(false)
    spark.stop()
  }
}
