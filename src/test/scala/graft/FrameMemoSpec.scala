package graft

import graft.operators.FrameMemo

/** Lifecycle contract of the shared (session, dir) frame memo: bounded
  * LRU over dirs, so a multi-dir session can no longer pin checkpoint
  * blocks indefinitely (round-7 advice item). Block reclamation itself is
  * the ContextCleaner's GC-driven job; what the memo must guarantee — and
  * what these tests pin — is that eviction drops the memo's strong
  * references on schedule. */
class FrameMemoSpec extends SparkSpecBase {
  import spark.implicits._

  private def frame(tag: String) = Seq((tag, 1L)).toDF("tag", "v")

  test("3-dir session: LRU keeps 2 dirs, evicted dir's frames are forgotten") {
    val m = new FrameMemo(maxDirs = 2)
    var builds = 0
    def get(dir: String): Unit = {
      m(spark, dir, "k") { builds += 1; frame(dir) }; ()
    }
    get("dirA"); get("dirB")
    assert(m.size === 2 && m.dirCount === 2 && builds === 2)
    get("dirA") // touch: A is now most-recent
    assert(builds === 2, "touch must not rebuild")
    get("dirC") // admits C, evicts B (least-recently-used)
    assert(m.dirCount === 2)
    assert(m.size === 2, s"evicted dir's frames must be dropped, size=${m.size}")
    get("dirA")
    assert(builds === 3, "A survived the eviction (recently used)")
    assert(builds === 3)
    get("dirB") // B was evicted: must rebuild
    assert(builds === 4, "B must rebuild after eviction")
  }

  test("multiple keys of one dir evict together; clear empties everything") {
    val m = new FrameMemo(maxDirs = 2)
    m(spark, "d1", "k1")(frame("a")); m(spark, "d1", "k2")(frame("b"))
    m(spark, "d2", "k1")(frame("c"))
    assert(m.size === 3)
    m(spark, "d3", "k1")(frame("d")) // evicts ALL of d1
    assert(m.size === 2, s"both d1 keys must go, size=${m.size}")
    m.clear()
    assert(m.size === 0 && m.dirCount === 0)
  }

  test("evicted frames stay usable by callers that hold them") {
    val m = new FrameMemo(maxDirs = 1)
    val held = m(spark, "dx", "k")(frame("held"))
    m(spark, "dy", "k")(frame("other")) // evicts dx
    // the caller's handle still computes — eviction only forgets the
    // memo's reference, it never invalidates in-flight frames
    assert(held.count() === 1L)
  }
}
