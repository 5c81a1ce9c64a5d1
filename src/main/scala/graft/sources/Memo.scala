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
}
