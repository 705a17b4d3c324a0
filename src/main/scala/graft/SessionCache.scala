package graft

import java.util.concurrent.CompletableFuture

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for derived artifacts that have INDEX semantics —
  * built once per (session, corpus), reused by every operator that needs
  * them (the shingle posting index, the IVF centroid model, table scan
  * plans). Weak session keys: entries die with their session, so stopped
  * sessions can't pin plans or cached blocks.
  */
object SessionCache {
  private val caches =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[Any, AnyRef]]())

  /** Memoizes `build` per (session, key), SINGLE-FLIGHT: the first caller
    * publishes a promise and builds; concurrent callers of the same key
    * wait on the promise instead of building a duplicate. The duplicate
    * build is not just wasted work — several cached artifacts are
    * `localCheckpoint`-ed DataFrames, and a race loser dropped without
    * unpersist would pin its checkpoint blocks in executor storage for the
    * session's lifetime.
    *
    * NOT computeIfAbsent: builds may be NESTED (the pair graph builds the
    * posting index), and a re-entrant computeIfAbsent throws "Recursive
    * update" whenever the two keys land in the same bin. The promise
    * handshake allows nested builds of DIFFERENT keys; dependencies are
    * one-directional (pair-graph → posting-index), so cross-key waits
    * cannot cycle. A build must not re-enter its OWN key (self-deadlock) —
    * none does. If a build fails, its entry is removed before the waiters
    * wake, so the next caller retries the build.
    */
  def getOrBuild[T <: AnyRef](spark: SparkSession, key: Any)(build: => T): T = {
    val perSession = caches.synchronized {
      var m = caches.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[Any, AnyRef]()
        caches.put(spark, m)
      }
      m
    }
    while (true) {
      val mine = new CompletableFuture[AnyRef]()
      val existing = perSession.putIfAbsent(key, mine)
      existing match {
        case null =>
          val built =
            try build
            catch {
              case e: Throwable =>
                // remove BEFORE completing: a woken waiter must find the
                // slot free so its retry can become the builder
                perSession.remove(key, mine)
                mine.completeExceptionally(e)
                throw e
            }
          perSession.put(key, built)
          mine.complete(built)
          return built.asInstanceOf[T]
        case f: CompletableFuture[_] =>
          try return f.get().asInstanceOf[T]
          catch {
            case _: java.util.concurrent.ExecutionException => // builder failed; retry
          }
        case v => return v.asInstanceOf[T]
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
