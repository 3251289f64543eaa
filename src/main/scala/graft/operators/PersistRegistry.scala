package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bounded registry for persists an operator family creates on its
  * own behalf — the release obligation collectable in one call.
  *
  * STRONG references on purpose: `Dataset.persist` registers the plan
  * strongly in the session CacheManager (Spark's ContextCleaner
  * reclaims RDD/broadcast/shuffle objects, never SQL cache entries),
  * so a weak registry would lose the only handle while the cache
  * stayed pinned forever. Bounded instead: insertion-ordered and
  * capped — past `cap` the OLDEST owned persist is evicted, and its
  * lazy consumers degrade to recompute, never to failure.
  *
  * Eviction is retire-don't-unpersist (the engine's drainRetiredSnaps
  * discipline in miniature): an evicted frame sits in a retired list
  * and its blocks release only at the NEXT cap overflow. That gives a
  * consumer mid-action on the evicted frame a one-eviction-cycle
  * grace window — it NARROWS the "Block rdd_N does not exist" race to
  * the pathological case of two overflows landing inside one action
  * (at the cap, each registration is an overflow), it does not
  * eliminate it; consumers that must survive that case need their own
  * block-loss retry. Shared by VectorOps and GlobalRank so the
  * mechanism cannot drift between copies.
  */
final class PersistRegistry(cap: Int) {
  private val lock = new Object
  private val owned = new java.util.LinkedHashMap[DataFrame, java.lang.Boolean]()
  private val retired = new java.util.ArrayList[DataFrame]()

  /** Persist (MEMORY_AND_DISK) and track `df`; returns the persisted
    * frame. May release the frames retired by the PREVIOUS overflow.
    */
  def register(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    track(p)
    p
  }

  /** Track an already-persisted frame (callers that pick their own
    * storage level).
    */
  def track(p: DataFrame): Unit = {
    val toRelease = lock.synchronized {
      owned.put(p, java.lang.Boolean.TRUE)
      if (owned.size > cap) {
        val it = owned.keySet().iterator()
        val oldest = it.next(); it.remove()
        val drained = new java.util.ArrayList[DataFrame](retired)
        retired.clear()
        retired.add(oldest)
        drained
      } else new java.util.ArrayList[DataFrame]()
    }
    toRelease.forEach(_.unpersist(blocking = false))
  }

  /** Unpersist every tracked frame (owned AND retired). Safe while
    * returned plans are still unconsumed — they degrade to recompute.
    * Snapshot-then-unpersist outside the lock (unpersist talks to the
    * block manager); frames registered concurrently stay tracked for
    * the next release instead of being dropped still-cached.
    */
  def releaseAll(): Unit = {
    val snapshot = lock.synchronized {
      val s = new java.util.ArrayList[DataFrame](owned.keySet())
      s.addAll(retired)
      owned.clear()
      retired.clear()
      s
    }
    snapshot.forEach(_.unpersist(blocking = false))
  }
}
