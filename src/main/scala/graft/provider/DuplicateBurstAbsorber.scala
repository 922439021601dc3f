package graft.provider

import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}

/** In-process burst absorber: memoizes the first concurrent attempt per
  * cache key so racing callers share one storage round-trip
  * (reference: absorber/DuplicateBurstAbsorber.kt:3-8; cached impl
  * absorber/impl/CachedDuplicateBurstAbsorber.kt:8-24 — Caffeine
  * putIfAbsent of a CompletableFuture; no-op impl
  * absorber/impl/NoDuplicateBurstAbsorber.kt:5-8).
  *
  * In the set-oriented Spark engine the same job is done by map-side
  * partial aggregation (see graft.operators.Dedup.absorberFirstWins);
  * this class exists for per-call API parity.
  */
trait DuplicateBurstAbsorber {
  /** Return the memoized value for `key`, running `loader` only for the
    * first caller within the absorb window.
    */
  def absorb(key: String, loader: () => String): String

  /** Drop the cached entry so the next caller reloads (used after a
    * FailedException — reference: DeduplicationProvider.kt:117-122).
    */
  def evict(key: String): Unit
}

/** Pass-through absorber (the builder default — reference:
  * builder/DeduplicationProviderBuilder.kt:35).
  */
class NoDuplicateBurstAbsorber extends DuplicateBurstAbsorber {
  override def absorb(key: String, loader: () => String): String = loader()
  override def evict(key: String): Unit = ()
}

/** Bounded, write-TTL'd memoizing absorber. Concurrent callers for the
  * same key block on the first caller's CompletableFuture — thread↔thread
  * boundary, exactly the reference's Caffeine behavior
  * (CachedDuplicateBurstAbsorber.kt:16-19). Entries expire `absorbMillis`
  * after write; the size bound evicts oldest-written first.
  */
class CachedDuplicateBurstAbsorber(maxSize: Int, absorbMillis: Long,
                                   clock: () => Long = System.currentTimeMillis)
    extends DuplicateBurstAbsorber {

  private case class Entry(future: CompletableFuture[String], writtenAt: Long)
  private val cache = new ConcurrentHashMap[String, Entry]()

  override def absorb(key: String, loader: () => String): String = {
    val now = clock()
    val fresh = new CompletableFuture[String]()
    var winner = cache.compute(key, (_, cur) =>
      if (cur == null || now - cur.writtenAt >= absorbMillis) Entry(fresh, now) else cur)
    if (winner.future eq fresh) {
      try fresh.complete(loader())
      catch { case t: Throwable => cache.remove(key); fresh.completeExceptionally(t) }
      if (cache.size() > maxSize) evictOldest()
    }
    try winner.future.join()
    catch {
      case e: java.util.concurrent.CompletionException if e.getCause != null =>
        throw e.getCause
    }
  }

  override def evict(key: String): Unit = cache.remove(key)

  private[provider] def size: Int = cache.size()

  private def evictOldest(): Unit = {
    import scala.jdk.CollectionConverters._
    cache.entrySet().asScala.toSeq
      .sortBy(_.getValue.writtenAt)
      .take(math.max(0, cache.size() - maxSize))
      .foreach(e => cache.remove(e.getKey, e.getValue))
  }
}
