package graft.operators

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded (session, dir)-scoped memo of lazily `localCheckpoint`'ed
  * frames — the shared-gate pattern used by TextAnalysis / DocDedup /
  * CorpusOps (tokenized corpus, candidate pairs, CC labels, gate frames).
  *
  * Lifecycle contract (the round-7 hardening): the map keeps at most
  * `maxDirs` most-recently-used (session, dir) groups. Admitting a NEW
  * dir beyond that evicts the least-recently-used dir's entries, dropping
  * every strong reference this memo holds to its checkpointed frames, so
  * the ContextCleaner reclaims their pinned blocks at the next GC instead
  * of accumulating them for the life of the process. Eviction is safe
  * mid-query: a caller still holding the evicted DataFrame keeps its RDD
  * alive (GC-reachability IS the cleaner's liveness rule); eviction only
  * forgets the memo's own handle, exactly like [[clear]] always did.
  *
  * `maxDirs = 2` covers every in-process multi-dir pattern we ship (bench
  * warms on sf0.001 then measures sfDir; specs pin one dir) while keeping
  * a 3-dir session bounded — the scenario that used to pin blocks forever.
  */
private[graft] final class FrameMemo(maxDirs: Int = 2) {
  private val frames = TrieMap[(SparkSession, String, String), DataFrame]()
  // LRU over (session, dir): LinkedHashSet iterates in insertion order;
  // re-inserting on touch moves a dir to the back.
  private val lru = mutable.LinkedHashSet[(SparkSession, String)]()

  def apply(spark: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame =
    raw(spark, dir, key)(build.localCheckpoint(false))

  /** [[apply]] for builds that already return a checkpointed frame
    * (e.g. connectedComponents) — memoizes without re-checkpointing. */
  def raw(spark: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = {
    synchronized {
      val g = (spark, dir)
      lru.remove(g); lru.add(g)
      while (lru.size > maxDirs) {
        val oldest = lru.head
        lru.remove(oldest)
        frames.keys.filter(k => (k._1, k._2) == oldest).foreach(frames.remove)
      }
    }
    // build OUTSIDE the lock: checkpoint materialization can take seconds
    // and concurrent workers (Verify's pool) must not serialize on it;
    // TrieMap.getOrElseUpdate keeps per-key build-once semantics.
    val df = frames.getOrElseUpdate((spark, dir, key), build)
    // close the touch→insert race: if another thread evicted this dir
    // while we were building, forget the orphan entry (the caller keeps
    // the returned frame alive; the memo must not)
    synchronized {
      if (!lru.contains((spark, dir))) frames.remove((spark, dir, key))
    }
    df
  }

  /** Drop every memoized frame so the ContextCleaner can reclaim all
    * checkpoint blocks immediately (tests / explicit session teardown). */
  def clear(): Unit = synchronized {
    frames.clear(); lru.clear()
  }

  private[graft] def size: Int = frames.size
  private[graft] def dirCount: Int = synchronized(lru.size)
}
