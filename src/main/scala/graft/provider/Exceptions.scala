package graft.provider

/** Error surface of the dedup protocol — same four types as the reference
  * (reference: src/main/kotlin/com/stroiker/distributed/deduplicator/
  * exception/{Duplicate,Retry,RetriesExceeded,Failed}Exception.kt, contract
  * README.md:46-50).
  */

/** Key was already processed by an earlier attempt. */
class DuplicateException(val key: String, val table: String, val keyspace: String)
  extends RuntimeException(s"Record duplication detected: key=$key, table=$table, keyspace=$keyspace")

/** Internal: concurrent writers raced and ordering was undefined for this
  * attempt; the retry strategy re-runs the protocol.
  */
class RetryException(val key: String, val table: String, val keyspace: String)
  extends RuntimeException(s"Undefined record order: key=$key, table=$table, keyspace=$keyspace")

/** The retry strategy exhausted its budget. */
class RetriesExceededException(val key: String, val table: String, val keyspace: String)
  extends RuntimeException(s"Retries exceeded: key=$key, table=$table, keyspace=$keyspace")

/** A storage write failed (insert or state transition was not applied). */
class FailedException(val key: String, val table: String, val keyspace: String)
  extends RuntimeException(s"Failed to save record: key=$key, table=$table, keyspace=$keyspace")
