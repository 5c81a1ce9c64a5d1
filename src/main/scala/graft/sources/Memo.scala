package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded memoizer for persisted per-(session, sfDir) DataFrames (the
  * materialized-view caches: Tables.orderItems, SparkEntry.docClusters).
  *
  * An unbounded ConcurrentHashMap would pin cached blocks and SparkSession
  * references for the life of the JVM; this LRU evicts beyond `maxEntries`
  * and unpersists the evicted DataFrame so its storage is released. Sized
  * for the realistic working set (a handful of (session, scale-factor)
  * combinations), not as a general cache.
  */
private[graft] final class Memo(maxEntries: Int = 8) {
  private type K = (SparkSession, String)

  private val m = new java.util.LinkedHashMap[K, DataFrame](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, DataFrame]): Boolean =
      if (size() > maxEntries) {
        try e.getValue.unpersist() catch { case _: Exception => () }
        true
      } else false
  }

  def getOrElseUpdate(k: K)(f: => DataFrame): DataFrame = m.synchronized {
    val v = m.get(k)
    if (v != null) v
    else {
      val nv = f
      m.put(k, nv)
      nv
    }
  }

  /** Explicit invalidation hook: unpersist and drop every cached entry.
    * Callers whose underlying data changed in-place (same path, rewritten
    * files — the one case a plan-derived key cannot see) must call this
    * before reusing a memoized builder. */
  def clear(): Unit = m.synchronized {
    m.values.forEach { df =>
      try df.unpersist() catch { case _: Exception => () }
    }
    m.clear()
  }
}

private[graft] object Memo {
  /** Collision-resistant key component for a DataFrame's logical plan:
    * md5 over the CANONICALIZED plan string (128-bit), not the 32-bit
    * `semanticHash` — a 32-bit collision between two different cached
    * plans would silently serve the wrong persisted result. The key still
    * identifies the PLAN, not the data: memoized entries assume the
    * scanned input is immutable for the app's life (the at-rest-layout
    * write-once convention); in-place rewrites require [[Memo.clear]]. */
  def planKey(df: DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = md.digest(
      df.queryExecution.logical.canonicalized.toString.getBytes("UTF-8"))
    bytes.map("%02x".format(_)).mkString
  }
}
