package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped stage memoization shared by the near-dup and
  * multimodal families: each (stage, dir) intermediate — shingle
  * indexes, verified pair graphs, cluster labels, fingerprint-pair
  * frames — is built once per session and persisted lazily, the way a
  * real curation DAG stages it. At 100 TB these would be bucketed
  * tables, not caches.
  *
  * NOT computeIfAbsent: stages memoize their own inputs (labels →
  * pairs → shingle arrays), and a nested computeIfAbsent on the same
  * map throws "Recursive update" whenever two keys land in one hash
  * bin. Double-checked under a reentrant monitor instead.
  *
  * WEAK-keyed by the session object: a stopped session's entries (and
  * the DataFrames they pin) become collectable, and — unlike an
  * identityHashCode key — a new session can never collide into a dead
  * session's plans. A hit whose persist was dropped (e.g. a spec
  * calling `clearCache()` on the shared session) is re-persisted, so
  * the memo stays a memo instead of silently degrading to a
  * recompute-per-consumer plan.
  */
private[operators] object StageMemo {

  private val stageCache = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  /** Storage level for memoized stages, overridable via
    * `-Dgraft.stagememo.level=MEMORY_AND_DISK_SER` (r7 next-round #8:
    * the memo footprint is the eviction-thrash surface under a
    * constrained driver heap). Default stays MEMORY_AND_DISK: SQL-cache
    * blocks are compressed columnar CachedBatches either way, and the
    * measured footprint delta at sf0.1 is ~0 (BASELINE.md persist-
    * footprint notes) — the knob exists so a constrained deployment can
    * flip it without a code change.
    */
  private[operators] def level: org.apache.spark.storage.StorageLevel =
    org.apache.spark.storage.StorageLevel.fromString(
      sys.props.getOrElse("graft.stagememo.level", "MEMORY_AND_DISK"))

  def memoized(spark: SparkSession, stage: String, dir: String)
              (build: => DataFrame): DataFrame = {
    val perSession = stageCache.synchronized {
      var m = stageCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        stageCache.put(spark, m)
      }
      m
    }
    val key = (stage, dir)
    def repersisted(df: DataFrame): DataFrame = {
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist(level)
      df
    }
    val hit = perSession.get(key)
    if (hit != null) repersisted(hit)
    else perSession.synchronized {
      val again = perSession.get(key)
      if (again != null) repersisted(again)
      else {
        val df = build.persist(level)
        perSession.put(key, df)
        df
      }
    }
  }
}
