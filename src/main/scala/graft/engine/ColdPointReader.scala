package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession

/** Driver-side cold point lookup — the analogue of the reference's
  * SSTable point-read path (hybrid_query_router POINT_LOOKUP via
  * bloom/index, never a scan): for `pk = lit` the pk-sorted tier
  * files are read DIRECTLY through parquet-hadoop with the predicate
  * pushed into the reader. No Spark job, no scheduler latency.
  *
  * Tier files are immutable once written, so everything knowable from
  * their metadata is cached per path (the reference caches a bloom
  * filter + sparse index per SSTable for the same reason,
  * sstable.hpp): the Hadoop conf, each tier's file listing, and each
  * file's pk min/max from its footer stats. A lookup then touches the
  * footer-parse + page-decode path ONLY for files whose pk range
  * covers the key — every other file is excluded without I/O. Per-file
  * verdicts are additionally LRU row-cached (the block-cache role), so
  * repeat reads of warm keys never touch the filesystem, and tier
  * files carry a pk bloom filter so in-range misses skip the decode.
  *
  * LWW across tiers: tiers are age-ordered in `coldDirs` (flush
  * drains hot rows whose seqs exceed everything flushed before, and a
  * leveled merge consumes a contiguous age range and lands in its
  * place), so every seq in a younger tier is greater than every seq
  * in an older one. The NEWEST tier containing the key therefore
  * holds its latest version — the scan early-exits there, tombstone
  * included (the caller treats a winning tombstone as "no row").
  * Hot-store versions are strictly newer than anything cold, so the
  * caller consults the hot map first and only falls here on a miss.
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

  // ---- observability (spec gates, not hot-path logic) -----------------------

  /** Files actually opened for data reads / footer metadata parses.
    * Spec-gated: after the metadata cache is warm, a point lookup must
    * open only files whose pk range covers the key, and must parse no
    * footers at all.
    */
  val dataFilesOpened = new java.util.concurrent.atomic.AtomicLong(0)
  val footersParsed   = new java.util.concurrent.atomic.AtomicLong(0)

  // ---- immutable-tier metadata caches ---------------------------------------

  /** One Hadoop conf per session — `newHadoopConf()` copies the full
    * configuration and costs more than the point read itself. Weak-keyed
    * on the session itself (identity equality — SparkSession doesn't
    * override equals): entries vanish with the session, and no identity
    * hash can ever alias two live sessions.
    */
  private val confCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, org.apache.hadoop.conf.Configuration])

  private def confOf(spark: SparkSession): org.apache.hadoop.conf.Configuration =
    confCache.synchronized {
      var c = confCache.get(spark)
      if (c == null) { c = spark.sessionState.newHadoopConf(); confCache.put(spark, c) }
      c
    }

  /** pk min/max of one tier file, from its footer row-group stats;
    * None when stats are absent (then the file must be read).
    */
  private final case class FileMeta(path: Path, range: Option[(Any, Any)])

  private val tierCache =
    scala.collection.concurrent.TrieMap.empty[String, Vector[FileMeta]]

  /** Dirs whose tiers were GC'd: a listing computed concurrently with
    * the eviction must not re-insert dead metadata (the compute inside
    * a plain getOrElseUpdate could finish AFTER evictTiers removed the
    * entry and win the insert — a stale FileMeta vector nothing evicts
    * again). Retired dirs are never cached again; tier paths embed a
    * monotonic seq and are not re-minted in-process, so this costs
    * nothing on live paths, and the set grows only with compaction
    * churn — the same rate the evicted cache entries themselves did.
    */
  private val retired = scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Bounded LRU row cache, keyed (tier file, pk) → that FILE's verdict
    * for the key (hit with version, or definitive absence). Tier files
    * are immutable, so entries can never go stale: a newer version of
    * the key lands in the hot store or a NEWER tier, both consulted
    * before this file. Repeated point reads of warm keys are served at
    * memory speed — the reference's block-cache role (SSTable blocks
    * cached across reads; sstable.hpp / SURVEY §2.4 C1).
    */
  private val rowCacheMax = 1 << 16
  private val rowCache =
    new java.util.LinkedHashMap[(String, Any), Option[RowVersion]](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Any), Option[RowVersion]]): Boolean =
        size() > rowCacheMax
    }

  /** Drop cached metadata (tests / bounded memory in very long-lived
    * drivers; stale entries for deleted tiers are otherwise harmless —
    * lookups never consult dirs outside the live coldDirs vector).
    */
  def invalidateCache(): Unit = {
    tierCache.clear()
    retired.clear()   // full reset: retired paths may be reused across test engines
    rowCache.synchronized(rowCache.clear())
  }

  /** Test probe: whether a tier dir's listing is currently cached. */
  private[graft] def tierCached(dir: String): Boolean = tierCache.contains(dir)

  /** Evict exactly the retired tier dirs' metadata (called from the
    * engine's deferred tier GC when the files are deleted): without
    * this, compaction churn in a long-lived driver grows the metadata
    * cache without bound — and a future tier that re-mints a deleted
    * path must not inherit its predecessor's footer stats.
    */
  def evictTiers(dirs: Iterable[String]): Unit = {
    // retire BEFORE removing: tierFiles double-checks `retired` after
    // any insert, so an in-flight listing that loses the race undoes
    // its own re-insert (see `retired` scaladoc)
    dirs.foreach { d => retired.put(d, ()); tierCache.remove(d) }
    // rowCache keys are fully-qualified Hadoop paths (the invariant is
    // asserted where they are minted — see the lookup cache insert)
    // while coldDirs may be relative — normalize the HANDFUL of prefix
    // dirs through NIO, but keep the per-key side to cheap string ops:
    // running Paths.get over 64k keys inside the lock would stall
    // every concurrent point read for the duration of a tier GC.
    def bare(p: String) =
      java.nio.file.Paths.get(p.stripPrefix("file:"))
        .toAbsolutePath.normalize.toString
    val prefixes = dirs.map(d => {
      val b = bare(d); if (b.endsWith("/")) b else b + "/"
    }).toVector
    rowCache.synchronized {
      val it = rowCache.keySet.iterator()
      while (it.hasNext) {
        val (file, _) = it.next()
        var f = file.stripPrefix("file:")
        if (f.startsWith("//")) {
          // authority form (file://host/x or file:///x): drop the
          // authority segment — over-matching only costs a re-read,
          // under-matching would leave a stale entry a re-minted
          // path could inherit
          val rest = f.drop(2)
          val slash = rest.indexOf('/')
          f = if (slash >= 0) rest.substring(slash) else "/" + rest
        }
        // non-absolute after the cheap strip (unexpected key shape):
        // fall back to full NIO normalization rather than silently
        // escaping eviction
        if (!f.startsWith("/")) f = bare(f)
        if (prefixes.exists(f.startsWith)) it.remove()
      }
    }
  }

  private def tierFiles(conf: org.apache.hadoop.conf.Configuration,
                        m: TableMeta, dir: String): Vector[FileMeta] =
    tierCache.get(dir).getOrElse {
      val d = new Path(dir)
      val fs = d.getFileSystem(conf)
      // A missing dir is NOT cached: a lookup holding an older coldDirs
      // snapshot can race the deferred tier GC and observe a dir that
      // evictTiers just deleted — caching Vector.empty here would
      // repopulate the cache being evicted with an entry nothing ever
      // removes again. Live dirs always exist, so the uncached miss
      // costs one fs.exists on a path that shouldn't be consulted anyway.
      if (!fs.exists(d)) Vector.empty
      else {
        val listing = fs.listStatus(d).toVector
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map { st =>
            val range =
              try {
                footersParsed.incrementAndGet()
                val r = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
                try {
                  import scala.jdk.CollectionConverters._
                  val stats = r.getFooter.getBlocks.asScala.toVector.flatMap { b =>
                    b.getColumns.asScala.find(
                      _.getPath.toDotString == m.cols(m.pkIndex).name)
                      .filter(c => c.getStatistics != null && !c.getStatistics.isEmpty
                        && c.getStatistics.hasNonNullValue)
                      .map(_.getStatistics)
                  }
                  if (stats.isEmpty) None
                  else {
                    val mins = stats.map(s => statValue(m, s.genericGetMin))
                    val maxs = stats.map(s => statValue(m, s.genericGetMax))
                    Some((mins.minBy(identity)(ordering(m)),
                      maxs.maxBy(identity)(ordering(m))))
                  }
                } finally r.close()
              } catch { case _: java.io.IOException => None }
            FileMeta(st.getPath, range)
          }
        // cache only dirs the GC has not retired, and double-check
        // after the insert: evictTiers marks `retired` before clearing
        // the cache, so losing the race here is always visible on the
        // re-check and the entry removes itself
        if (!retired.contains(dir)) {
          tierCache.putIfAbsent(dir, listing)
          if (retired.contains(dir)) tierCache.remove(dir)
        }
        listing
      }
    }

  /** Stats are kept in their parquet-comparable representation: Str
    * stays raw UTF-8 bytes, because parquet UTF8 min/max are ordered by
    * UNSIGNED lexicographical byte comparison, and java.lang.String
    * ordering (UTF-16 code units) disagrees for supplementary code
    * points vs U+E000–U+FFFF — decoding before comparing could prune a
    * file that actually holds the key.
    */
  private def statValue(m: TableMeta, v: Any): Any = m.cols(m.pkIndex).tpe match {
    case ColType.Str => v.asInstanceOf[Binary].getBytes
    case _           => v
  }

  /** The pk literal in the same representation `statValue` uses. */
  private def statKey(m: TableMeta, pk: Any): Any = m.cols(m.pkIndex).tpe match {
    case ColType.Str => pk.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case _           => pk
  }

  private def ordering(m: TableMeta): Ordering[Any] = (m.cols(m.pkIndex).tpe match {
    case ColType.I64 | ColType.Ts => Ordering.Long.on[Any](_.asInstanceOf[java.lang.Long].longValue)
    case ColType.I32              => Ordering.Int.on[Any](_.asInstanceOf[java.lang.Integer].intValue)
    case ColType.Str              =>
      new Ordering[Any] { // parquet UTF8 order: unsigned lexicographical bytes
        def compare(x: Any, y: Any): Int = java.util.Arrays.compareUnsigned(
          x.asInstanceOf[Array[Byte]], y.asInstanceOf[Array[Byte]])
      }
    case t => throw new IllegalArgumentException(s"unsupported pk type $t")
  })

  private def mayContain(fm: FileMeta, m: TableMeta, pk: Any): Boolean =
    fm.range match {
      case None             => true // no stats: must read
      case Some((lo, hi))   =>
        val ord = ordering(m)
        val k = statKey(m, pk)
        ord.lteq(lo, k) && ord.lteq(k, hi)
    }

  /** Latest cold version of `pk` across `coldDirs` (tombstones
    * included — the caller interprets), or None if no tier holds it.
    */
  def lookup(spark: SparkSession, m: TableMeta, coldDirs: Seq[String],
             pk: Any): Option[RowVersion] = {
    val conf = confOf(spark)
    val filter = FilterCompat.get(pkPredicate(m, pk))
    // newest tier first — the first tier containing the key holds its
    // latest version (age-order invariant, scaladoc above)
    val it = coldDirs.reverseIterator
    while (it.hasNext) {
      val dir = it.next()
      // within one tier a pk occurs at most once (flush writes the
      // latest-version map; merges dedup), but keep max-seq across the
      // tier's files anyway — robustness over assumption
      var best: Option[RowVersion] = None
      tierFiles(conf, m, dir).foreach { fm =>
        if (mayContain(fm, m, pk)) {
          val verdict = cachedFileLookup(conf, m, filter, fm, pk)
          verdict.foreach(rv => if (best.forall(_.seq < rv.seq)) best = Some(rv))
        }
      }
      if (best.isDefined) return best
    }
    None
  }

  /** Batched latest-cold-version resolution for MANY pks (r19 — the
    * incremental aggregate fold resolves its whole write delta here):
    * ONE reader open per candidate tier file instead of one per
    * (pk × file). Under a write burst whose ids overlap existing tier
    * ranges, the per-pk path paid a fresh ParquetReader open (footer
    * parse + row-group elimination) per miss — reader-open-bound at
    * hundreds of µs per pk; the batched pass amortizes the open across
    * the delta with one IN predicate. Verdicts (positive AND negative)
    * land in the same per-file row cache the single-pk path uses, so
    * the two paths stay coherent. Age-order contract identical to
    * [[lookup]]: newest tier containing a pk wins.
    */
  def lookupMany(spark: SparkSession, m: TableMeta, coldDirs: Seq[String],
                 pks: Seq[Any]): Map[Any, RowVersion] = {
    if (pks.isEmpty) return Map.empty
    val conf = confOf(spark)
    val resolved = scala.collection.mutable.HashMap.empty[Any, RowVersion]
    var remaining: Set[Any] = pks.toSet
    val it = coldDirs.reverseIterator
    while (it.hasNext && remaining.nonEmpty) {
      val dir = it.next()
      val tierBest = scala.collection.mutable.HashMap.empty[Any, RowVersion]
      def offer(pk: Any, rv: RowVersion): Unit =
        if (tierBest.get(pk).forall(_.seq < rv.seq)) tierBest(pk) = rv
      tierFiles(conf, m, dir).foreach { fm =>
        val cands = remaining.filter(pk => mayContain(fm, m, pk))
        if (cands.nonEmpty) {
          val uncached = cands.filter { pk =>
            val hit = rowCache.synchronized(rowCache.get((fm.path.toString, pk)))
            if (hit != null) { hit.foreach(offer(pk, _)); false } else true
          }
          if (uncached.nonEmpty) {
            val found = bulkFileLookup(conf, m, fm, uncached)
            uncached.foreach { pk =>
              val v = found.get(pk)
              rowCache.synchronized(rowCache.put((fm.path.toString, pk), v))
              v.foreach(offer(pk, _))
            }
          }
        }
      }
      resolved ++= tierBest
      remaining = remaining -- tierBest.keys
    }
    resolved.toMap
  }

  /** One file, many pks, ONE reader pass (IN predicate). Per-pk
    * max-seq kept like the single-pk path.
    */
  private def bulkFileLookup(conf: org.apache.hadoop.conf.Configuration,
                             m: TableMeta, fm: FileMeta,
                             pks: Iterable[Any]): Map[Any, RowVersion] = {
    dataFilesOpened.incrementAndGet()
    val out = scala.collection.mutable.HashMap.empty[Any, RowVersion]
    val reader = ParquetReader.builder(new GroupReadSupport(), fm.path)
      .withConf(conf).withFilter(FilterCompat.get(pkInPredicate(m, pks))).build()
    try {
      var g = reader.read()
      while (g != null) {
        val rv = toRowVersion(g, m)
        val pk = rv.values(m.pkIndex)
        if (out.get(pk).forall(_.seq < rv.seq)) out(pk) = rv
        g = reader.read()
      }
    } finally reader.close()
    out.toMap
  }

  private def pkInPredicate(m: TableMeta, pks: Iterable[Any]): FilterPredicate = {
    import scala.jdk.CollectionConverters._
    val name = m.cols(m.pkIndex).name
    m.cols(m.pkIndex).tpe match {
      case ColType.I64 | ColType.Ts =>
        FilterApi.in(FilterApi.longColumn(name),
          pks.map(pk => java.lang.Long.valueOf(pk.asInstanceOf[Long])).toSet.asJava)
      case ColType.I32 =>
        FilterApi.in(FilterApi.intColumn(name),
          pks.map(pk => java.lang.Integer.valueOf(pk.asInstanceOf[Int])).toSet.asJava)
      case ColType.Str =>
        FilterApi.in(FilterApi.binaryColumn(name),
          pks.map(pk => Binary.fromString(pk.asInstanceOf[String])).toSet.asJava)
      case t => throw new IllegalArgumentException(s"unsupported pk type $t")
    }
  }

  /** One immutable file's verdict for `pk`, LRU-cached (negative
    * results included — a definitive "not in this file" is as
    * cacheable as a hit).
    */
  private def cachedFileLookup(conf: org.apache.hadoop.conf.Configuration,
                               m: TableMeta, filter: FilterCompat.Filter,
                               fm: FileMeta, pk: Any): Option[RowVersion] = {
    // key invariant relied on by evictTiers' cheap prefix match:
    // fm.path came from FileSystem.listStatus, which returns
    // fully-qualified, normalized paths (file:/abs/... on local FS) —
    // eviction handles authority / non-absolute forms with a slower
    // fallback, but this is the shape that must stay canonical
    val key = (fm.path.toString, pk)
    val hit = rowCache.synchronized(rowCache.get(key))
    if (hit != null) return hit
    dataFilesOpened.incrementAndGet()
    var best: Option[RowVersion] = None
    val reader = ParquetReader.builder(new GroupReadSupport(), fm.path)
      .withConf(conf).withFilter(filter).build()
    try {
      var g = reader.read()
      while (g != null) {
        val rv = toRowVersion(g, m)
        if (best.forall(_.seq < rv.seq)) best = Some(rv)
        g = reader.read()
      }
    } finally reader.close()
    rowCache.synchronized(rowCache.put(key, best))
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
