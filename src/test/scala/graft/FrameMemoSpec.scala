package graft

import graft.operators.FrameMemo

/** Lifecycle contract of the shared (session, dir) frame memo: bounded
  * LRU over dirs with EXPLICIT release on eviction, so a multi-dir
  * session can no longer pin checkpoint blocks indefinitely (round-7
  * advice item). Release is explicit (unpersist of the underlying
  * checkpointed RDDs) because GC-driven ContextCleaner reclamation is
  * measurably unreliable here — on Spark 4.1 a dropped locally-
  * checkpointed RDD survives arbitrarily many System.gc() rounds once a
  * later shuffle-bearing query has run while another checkpointed frame
  * stays live (see the FrameMemo class doc). */
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

  test("3-dir session WITHOUT clearMemo: the evicted dir's checkpoint " +
    "RDDs are unpersisted on eviction (no pinned blocks left behind)") {
    val sc = spark.sparkContext
    val m = new FrameMemo(maxDirs = 2)
    // build inside a function so the test holds NO reference to the
    // returned frame; returns the persisted-RDD ids the build added
    def buildIds(dir: String, mult: Long): Set[Int] = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val df = m(spark, dir, "k")(
        spark.range(5000).select(($"id" * mult).as("v")).toDF())
      assert(df.count() === 5000L) // materialize the lazy checkpoint
      (sc.getPersistentRDDs.keySet.toSet -- before)
    }
    val idsA = buildIds("dirA", 3)
    val idsB = buildIds("dirB", 5)
    assert(idsA.nonEmpty && idsB.nonEmpty,
      "localCheckpoint should register persisted RDDs")
    val idsC = buildIds("dirC", 7) // LRU-evicts dirA → releases its RDDs
    // release is explicit unpersist: the persistentRdds entry is removed
    // synchronously (block deletion itself may lag; the ENTRY may not)
    assert(idsA.forall(id => !sc.getPersistentRDDs.contains(id)),
      s"dirA checkpoint RDDs still pinned after eviction: " +
        idsA.filter(sc.getPersistentRDDs.contains))
    // ...while the dirs the memo still holds stay pinned and usable
    assert(idsB.forall(sc.getPersistentRDDs.contains),
      "dirB (recently used) lost its checkpoint")
    assert(idsC.forall(sc.getPersistentRDDs.contains),
      "dirC (just admitted) lost its checkpoint")
    m.clear() // ...and clear releases those too
    assert((idsB ++ idsC).forall(id => !sc.getPersistentRDDs.contains(id)),
      "clear() must unpersist everything it held")
  }

  test("stress: 8 concurrent builders × 4 dirs through constant eviction — " +
    "no evicted-frame use, no leaked checkpoint RDDs") {
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.keySet.toSet
    val m = new FrameMemo(maxDirs = 2)
    val dirs = Vector("cA", "cB", "cC", "cD")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        try {
          val rnd = new scala.util.Random(t) // deterministic per thread
          for (_ <- 0 until 20) {
            val dir = dirs(rnd.nextInt(dirs.length))
            // EAGER checkpoint in the build — the dangerous class: a
            // losing double-build or an unpinned eviction would leak or
            // kill blocks mid-count
            val n = m.withFrame(spark, dir, "k") {
              spark.range(2000).select(($"id" + dir.length).as("v"))
                .toDF().localCheckpoint(true)
            } { df => df.count() }
            if (n != 2000L) throw new AssertionError(s"$dir count=$n")
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent use failed: ${errs.peek()}")
    m.clear()
    val leaked = sc.getPersistentRDDs.keySet.toSet -- baseline
    assert(leaked.isEmpty,
      s"checkpoint RDDs leaked after clear(): ${leaked.toSeq.sorted}")
  }

  test("an evicted dir is rebuilt (not resurrected) on re-request") {
    val m = new FrameMemo(maxDirs = 1)
    var builds = 0
    def get(dir: String): Long = {
      val df = m(spark, dir, "k") { builds += 1; frame(dir) }
      df.count()
    }
    assert(get("dx") === 1L && builds === 1)
    assert(get("dy") === 1L && builds === 2) // evicts + releases dx
    // dx's frame was released with its blocks; the memo must hand back a
    // FRESH build, never the dead evicted frame
    assert(get("dx") === 1L && builds === 3)
  }
}
