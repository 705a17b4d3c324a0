package graft

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

  def getOrBuild[T <: AnyRef](spark: SparkSession, key: Any)(build: => T): T = {
    val perSession = caches.synchronized {
      var m = caches.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[Any, AnyRef]()
        caches.put(spark, m)
      }
      m
    }
    // NOT computeIfAbsent: builds may be NESTED (the pair graph builds the
    // posting index), and a re-entrant computeIfAbsent throws "Recursive
    // update" whenever the two keys land in the same bin. Check-then-put
    // races at worst rebuild the artifact once; putIfAbsent keeps one
    // canonical value.
    val cached = perSession.get(key)
    if (cached != null) return cached.asInstanceOf[T]
    val built = build
    val prev = perSession.putIfAbsent(key, built)
    (if (prev != null) prev else built).asInstanceOf[T]
  }
}
