package graft.provider

import java.util.concurrent.CompletableFuture

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
  * after write (a Caffeine `expireAfterWrite` analog, checked lazily on
  * access); the size bound evicts least-recently-ACCESSED first via an
  * access-ordered map — O(1) per overflow, no sort, matching the
  * recency-based eviction the reference's Caffeine `maximumSize`
  * implies. The monitor guards only O(1) map manipulation; the loader
  * (a storage round trip) always runs outside it.
  */
class CachedDuplicateBurstAbsorber(maxSize: Int, absorbMillis: Long,
                                   clock: () => Long = System.currentTimeMillis)
    extends DuplicateBurstAbsorber {

  private case class Entry(future: CompletableFuture[String], writtenAt: Long)
  // accessOrder=true: iteration order is least-recently-used first.
  // Eviction is NOT removeEldestEntry (which would fire inside put and
  // could victimize an entry whose loader is still in flight — a
  // concurrent duplicate burst on that key would then run a second
  // loader); overflow is trimmed explicitly, preferring completed
  // entries in LRU order and touching an in-flight one only when every
  // entry is in flight (the size bound stays hard).
  private val cache = new java.util.LinkedHashMap[String, Entry](16, 0.75f, true)

  private def trimOverflow(): Unit = {
    while (cache.size() > maxSize) {
      val it = cache.entrySet().iterator()
      var victim: String = null
      while (victim == null && it.hasNext) {
        val e = it.next()
        if (e.getValue.future.isDone) victim = e.getKey
      }
      if (victim != null) cache.remove(victim)
      else cache.remove(cache.entrySet().iterator().next().getKey)
    }
  }

  override def absorb(key: String, loader: () => String): String = {
    val now = clock()
    val fresh = new CompletableFuture[String]()
    val winner = cache.synchronized {
      val cur = cache.get(key) // get() refreshes this key's recency
      if (cur == null || now - cur.writtenAt >= absorbMillis) {
        val e = Entry(fresh, now)
        cache.put(key, e)
        trimOverflow()
        e
      } else cur
    }
    if (winner.future eq fresh) {
      try fresh.complete(loader())
      catch { case t: Throwable =>
        // drop the failed entry, but never a successor that replaced it
        cache.synchronized {
          val cur = cache.get(key)
          if (cur != null && (cur.future eq fresh)) cache.remove(key)
        }
        fresh.completeExceptionally(t)
      }
    }
    try winner.future.join()
    catch {
      case e: java.util.concurrent.CompletionException if e.getCause != null =>
        throw e.getCause
    }
  }

  override def evict(key: String): Unit =
    cache.synchronized { cache.remove(key); () }

  private[provider] def size: Int = cache.synchronized(cache.size())
}
