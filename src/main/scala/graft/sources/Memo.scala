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

  /** Non-building read — present iff cached (touches LRU recency). */
  def peek(k: K): Option[DataFrame] = m.synchronized(Option(m.get(k)))

  /** Overwriting insert, for callers that must keep SIBLING entries
    * consistent (the bpe3 merges/corpus pair is rebuilt together from
    * one chain — r17 ADVICE). The displaced frame is unpersisted like
    * every other removal path (eviction, clear) so the class invariant
    * holds for any future caller; on checkpoint-backed frames (the bpe3
    * pair) Dataset.unpersist is a CacheManager no-op and their blocks
    * fall to the ContextCleaner once unreferenced. */
  def put(k: K, v: DataFrame): Unit = m.synchronized {
    val prev = m.put(k, v)
    if (prev != null && (prev ne v))
      try prev.unpersist() catch { case _: Exception => () }
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
  /** md5 hex of a string — the one shared digest helper for memo keys
    * (one definition, so a keying fix can never apply to half the
    * call sites). */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Collision-resistant key component for a DataFrame's plan. Built from
    * the ANALYZED plan — the unresolved `logical` plan's toString omits
    * exactly the identity that matters (a raw parquet read stringifies to
    * a constant `UnresolvedDataSource … paths: 1 provided` with no path,
    * and toString truncates projections at `maxToStringFields`), so
    * hashing it collides across tables and scale factors. The key
    * concatenates (a) the analyzed canonicalized plan's semanticHash —
    * resolved structure, (b) the full output schema JSON — untruncated
    * column identity, and (c) every file-relation's root paths collected
    * from the plan — the table identity toString drops; the md5 of that
    * is 128-bit. The key still identifies the PLAN, not the data:
    * memoized entries assume the scanned input is immutable for the
    * app's life (the at-rest-layout write-once convention); in-place
    * rewrites require [[Memo#clear]]. */
  def planKey(df: DataFrame): String = {
    val analyzed = df.queryExecution.analyzed
    val paths = analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.mkString(",")
          case other => other.toString
        }
    }.mkString(";")
    md5Hex(s"${analyzed.canonicalized.semanticHash()}|${analyzed.schema.json}|$paths")
  }
}
