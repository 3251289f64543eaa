package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession

/** Driver-side cold point lookup — the analogue of the reference's
  * SSTable point-read path (hybrid_query_router POINT_LOOKUP via
  * bloom/index, never a scan): for `pk = lit` the pk-sorted tier
  * files are read DIRECTLY through parquet-hadoop with the predicate
  * pushed into the reader, so row groups whose pk min/max exclude the
  * key are skipped from their footer stats alone. No Spark job, no
  * scheduler latency — a cold point read costs file-open + one row
  * group, the same shape as the reference's native path.
  *
  * LWW across tiers: every tier may hold at most one version of the
  * key (flush writes the latest-version map; compaction dedups); the
  * highest __seq wins, tombstone included — the caller treats a
  * winning tombstone as "no row". Hot-store versions are strictly
  * newer than anything cold (flush drains the hot map), so the caller
  * consults the hot map first and only falls here on a miss.
  */
object ColdPointReader {

  /** Native predicates exist for the integer/string pk types; other
    * pk types fall back to the Spark scan path.
    */
  def supportedPk(m: TableMeta): Boolean =
    m.cols(m.pkIndex).tpe match {
      case ColType.I64 | ColType.I32 | ColType.Str | ColType.Ts => true
      case _ => false
    }

  private def pkPredicate(m: TableMeta, pk: Any): FilterPredicate = {
    val name = m.cols(m.pkIndex).name
    m.cols(m.pkIndex).tpe match {
      case ColType.I64 | ColType.Ts =>
        FilterApi.eq(FilterApi.longColumn(name), java.lang.Long.valueOf(pk.asInstanceOf[Long]))
      case ColType.I32 =>
        FilterApi.eq(FilterApi.intColumn(name), java.lang.Integer.valueOf(pk.asInstanceOf[Int]))
      case ColType.Str =>
        FilterApi.eq(FilterApi.binaryColumn(name), Binary.fromString(pk.asInstanceOf[String]))
      case t => throw new IllegalArgumentException(s"unsupported pk type $t")
    }
  }

  /** Latest cold version of `pk` across `coldDirs` (tombstones
    * included — the caller interprets), or None if no tier holds it.
    */
  def lookup(spark: SparkSession, m: TableMeta, coldDirs: Seq[String],
             pk: Any): Option[RowVersion] = {
    val conf = spark.sessionState.newHadoopConf()
    val filter = FilterCompat.get(pkPredicate(m, pk))
    var best: Option[RowVersion] = None
    coldDirs.foreach { dir =>
      val d = new Path(dir)
      val fs = d.getFileSystem(conf)
      if (fs.exists(d)) fs.listStatus(d)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { st =>
          val reader = ParquetReader.builder(new GroupReadSupport(), st.getPath)
            .withConf(conf).withFilter(filter).build()
          try {
            var g = reader.read()
            while (g != null) {
              val rv = toRowVersion(g, m)
              if (best.forall(_.seq < rv.seq)) best = Some(rv)
              g = reader.read()
            }
          } finally reader.close()
        }
    }
    best
  }

  private def toRowVersion(g: Group, m: TableMeta): RowVersion = {
    val values = m.cols.map { c =>
      if (g.getFieldRepetitionCount(c.name) == 0) null
      else c.tpe match {
        case ColType.I64 | ColType.Ts => Long.box(g.getLong(c.name, 0))
        case ColType.I32   => Int.box(g.getInteger(c.name, 0))
        case ColType.F64   => Double.box(g.getDouble(c.name, 0))
        case ColType.F32   => Float.box(g.getFloat(c.name, 0))
        case ColType.Str   => g.getString(c.name, 0)
        case ColType.Bool  => Boolean.box(g.getBoolean(c.name, 0))
        case ColType.Bytes => g.getBinary(c.name, 0).getBytes
      }
    }.toArray[Any]
    RowVersion(g.getLong("__seq", 0), g.getBoolean("__tombstone", 0), values)
  }
}
