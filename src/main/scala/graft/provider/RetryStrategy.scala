package graft.provider

import java.util.concurrent.{CompletableFuture, Executor, ExecutorService, TimeUnit}
import java.util.function.Supplier

/** Sync retry orchestration — driver-side control flow, not a distributed
  * op (SURVEY.md §2 O12-O14). Only `RetryException` triggers a retry; any
  * other error passes through; exhaustion throws
  * `RetriesExceededException` (reference: strategy/sync/impl files).
  */
trait RetryStrategy {
  def retry[T](action: () => T): T
}

/** No retries: first `RetryException` becomes `RetriesExceededException`
  * (reference: strategy/sync/impl/NoRetryStrategy.kt:7-17).
  */
class NoRetryStrategy extends RetryStrategy {
  override def retry[T](action: () => T): T =
    try action()
    catch {
      case e: RetryException =>
        throw new RetriesExceededException(e.key, e.table, e.keyspace)
    }
}

/** Up to `times` retries with a constant delay between attempts
  * (reference: strategy/sync/impl/FixedDelayRetryStrategy.kt:8-27).
  */
class FixedDelayRetryStrategy(times: Int, delayMillis: Long) extends RetryStrategy {
  override def retry[T](action: () => T): T = {
    var remaining = times
    while (true) {
      try return action()
      catch {
        case e: RetryException =>
          if (remaining <= 0)
            throw new RetriesExceededException(e.key, e.table, e.keyspace)
          remaining -= 1
          Thread.sleep(delayMillis)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Exponential backoff with the reference's exact growth law:
  * delay(n) = initialDelay · e^n — natural exp, NOT 2^n
  * (reference: strategy/sync/impl/ExponentialDelayRetryStrategy.kt:29-30).
  */
class ExponentialDelayRetryStrategy(times: Int, private[provider] val initialDelayMillis: Long) extends RetryStrategy {
  private[provider] def delayFor(attempt: Int): Long =
    if (attempt == 0) initialDelayMillis
    else (initialDelayMillis * math.exp(attempt.toDouble)).toLong

  override def retry[T](action: () => T): T = {
    var attempt = 0
    while (true) {
      try return action()
      catch {
        case e: RetryException =>
          if (attempt >= times)
            throw new RetriesExceededException(e.key, e.table, e.keyspace)
          Thread.sleep(delayFor(attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Async retry orchestration: non-blocking re-attempts on a supplied
  * executor via `CompletableFuture.delayedExecutor`
  * (reference: strategy/async/RetryStrategyAsync.kt:5-8 and impls).
  * The first attempt runs on the calling thread, exactly like the
  * reference (FixedDelayRetryStrategyAsync.kt:20-23).
  */
trait RetryStrategyAsync {
  def retryAsync[T](action: () => T): CompletableFuture[T]
}

abstract private[provider] class DelayedRetryBase(executor: ExecutorService)
    extends RetryStrategyAsync {
  protected def budget: Int
  protected def delayFor(attempt: Int): Long

  override def retryAsync[T](action: () => T): CompletableFuture[T] = {
    val result = new CompletableFuture[T]()
    def attemptOnce(attempt: Int): Unit =
      try result.complete(action())
      catch {
        case e: RetryException =>
          if (attempt >= budget)
            result.completeExceptionally(
              new RetriesExceededException(e.key, e.table, e.keyspace))
          else {
            val delayed: Executor =
              CompletableFuture.delayedExecutor(delayFor(attempt), TimeUnit.MILLISECONDS, executor)
            delayed.execute(() => attemptOnce(attempt + 1))
          }
        case t: Throwable => result.completeExceptionally(t)
      }
    attemptOnce(0) // first attempt on the calling thread
    result
  }
}

/** Async no-retry (reference: strategy/async/impl/NoRetryStrategyAsync.kt:8-25). */
class NoRetryStrategyAsync extends RetryStrategyAsync {
  override def retryAsync[T](action: () => T): CompletableFuture[T] = {
    val result = new CompletableFuture[T]()
    try result.complete(action())
    catch {
      case e: RetryException =>
        result.completeExceptionally(new RetriesExceededException(e.key, e.table, e.keyspace))
      case t: Throwable => result.completeExceptionally(t)
    }
    result
  }
}

/** Async fixed delay (reference: strategy/async/impl/FixedDelayRetryStrategyAsync.kt:11-36). */
class FixedDelayRetryStrategyAsync(times: Int, delayMillis: Long, executor: ExecutorService)
    extends DelayedRetryBase(executor) {
  override protected def budget: Int = times
  override protected def delayFor(attempt: Int): Long = delayMillis
}

/** Async exponential delay, e^n law
  * (reference: strategy/async/impl/ExponentialDelayRetryStrategyAsync.kt:38-39).
  */
class ExponentialDelayRetryStrategyAsync(times: Int,
                                         private[provider] val initialDelayMillis: Long,
                                         executor: ExecutorService)
    extends DelayedRetryBase(executor) {
  override protected def budget: Int = times
  override protected def delayFor(attempt: Int): Long =
    if (attempt == 0) initialDelayMillis
    else (initialDelayMillis * math.exp(attempt.toDouble)).toLong
}
