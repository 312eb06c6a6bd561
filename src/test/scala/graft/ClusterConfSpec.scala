package graft

import scala.io.Source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keeps `conf/cluster-100tb.conf` honest (SURVEY §6.1's sizing prose as
  * a CHECKED artifact): the file must carry the claimed knobs, and a
  * session configured with its runtime-settable SQL confs — including
  * `spark.sql.shuffle.partitions = 50000` — must still PLAN the
  * representative queries (planning is partition-count-agnostic; no
  * operator pins a partitioning that conflicts with the cluster width).
  * Planning only, no execution: at 50k partitions running local would
  * measure task-launch overhead, not plan validity — the alt-config
  * GATE sweep covers executed correctness at cluster-like widths.
  */
class ClusterConfSpec extends SparkSpecBase {

  private lazy val conf: Map[String, String] = {
    val src = Source.fromFile("conf/cluster-100tb.conf", "UTF-8")
    try src.getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val Array(k, v) = l.split("\\s+", 2); (k, v.trim) }
      .toMap
    finally src.close()
  }

  /** Session-cloned (shared context, isolated SQLConf) with every
    * runtime-settable `spark.sql.*` knob from the artifact applied. */
  private lazy val cluster: SparkSession = {
    val s = spark.newSession()
    conf.filter(_._1.startsWith("spark.sql."))
      .filterNot(_._1.contains("streaming.stateStore")) // builder-time only
      .foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  private def planned(df: DataFrame): String = {
    val p = df.queryExecution.executedPlan // plans (incl. AQE wrap), never runs
    p.toString
  }

  test("artifact carries the SURVEY §6.1 sizing claims") {
    assert(conf("spark.sql.shuffle.partitions") === "50000")
    assert(conf("spark.sql.files.maxPartitionBytes") === "268435456")
    assert(conf("spark.sql.adaptive.enabled") === "true")
    assert(conf("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(conf("spark.sql.autoBroadcastJoinThreshold") === "10485760")
    assert(conf("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    assert(conf("spark.executor.instances") === "1000")
  }

  test("representative queries plan clean at shuffle.partitions=50000") {
    assert(cluster.conf.get("spark.sql.shuffle.partitions") === "50000")
    // one per plan family whose CONSTRUCTION is lazy (no build-time jobs):
    // scan+agg, two-fact join+agg, broadcast-dim star join, within-cell
    // self-join, window/top-k
    val reps = Seq(
      "pricing_summary", "shipping_priority", "brand_promo",
      "semantic_dedup", "big_orders", "media_decode")
    reps.foreach { name =>
      val plan = planned(SparkEntry.queries(name)(cluster, Sf0001))
      assert(!plan.contains("CartesianProduct"),
        s"$name degenerates to a cartesian at cluster width:\n$plan")
    }
  }

  test("AsOfJoinExec pins BOTH children to the cluster width (no conflicting partitioning)") {
    // Under AQE the executed plan is an AdaptiveSparkPlanExec wrapper
    // whose inner tree isn't reachable via collect(); the printed plan
    // carries the inserted exchanges, so assert on it.
    val plan = planned(SparkEntry.queries("asof_join")(cluster, Sf0001))
    // the merge zips child partitions 1:1, so BOTH pinned exchanges must
    // exist and agree — at exactly the width the artifact configures
    val pinned = "hashpartitioning\\([^)]*, 50000\\)".r
      .findAllIn(plan).size
    assert(pinned >= 2,
      s"expected both as-of exchanges pinned at 50000:\n$plan")
  }
}
