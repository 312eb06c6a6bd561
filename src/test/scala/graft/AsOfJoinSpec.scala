package graft

import java.sql.Timestamp

import graft.plans.AsOfJoin

case class L(id: Long, user: Long, ts: Timestamp)
case class R(p_user: Long, p_ts: Timestamp, p_id: Long)

/** The custom backward as-of join: exact matching semantics on a
  * hand-computed fixture, plus the physical plan contract (custom exec
  * node fed by hash exchanges + (key, time) sorts). */
class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(m: Long) = new Timestamp(1704067200000L + m * 1000L)

  // user 1: right rows at t10, t20; user 2: none; user 3: right-only.
  private def leftDf = Seq(
    L(1, 1L, t(5)),   // before any purchase -> drops
    L(2, 1L, t(10)),  // exactly at p10 -> matches p10 (<=)
    L(3, 1L, t(15)),  // between -> p10
    L(4, 1L, t(25)),  // after both -> p20
    L(5, 2L, t(50))   // user with no right rows -> drops
  ).toDF()

  private def rightDf = Seq(
    R(1L, t(10), 100L), R(1L, t(20), 200L), R(3L, t(1), 300L)
  ).toDF()

  test("backward as-of join picks the latest right row at-or-before each left row") {
    val got = AsOfJoin(leftDf, rightDf, "user", "p_user", "ts", "p_ts")
      .select($"id", $"p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 100L), (3L, 100L), (4L, 200L)))
  }

  test("as-of join result is identical across reruns and partition counts") {
    val a = AsOfJoin(leftDf, rightDf, "user", "p_user", "ts", "p_ts")
      .select($"id", $"p_id").collect().toSet
    val b = AsOfJoin(leftDf.repartition(7), rightDf.repartition(2),
        "user", "p_user", "ts", "p_ts")
      .select($"id", $"p_id").collect().toSet
    assert(a === b)
  }

  test("NULL keys and NULL times never match (SQL inner-join semantics)") {
    import org.apache.spark.sql.functions.{lit, when, col}
    val l = Seq(L(1, 1L, t(10)), L(2, 7L, t(10)), L(3, 1L, t(10))).toDF()
      .withColumn("user", when(col("id") === 2, lit(null)).otherwise(col("user")))
      .withColumn("ts", when(col("id") === 3, lit(null)).otherwise(col("ts")))
    val r = Seq(R(1L, t(5), 100L), R(8L, t(5), 800L)).toDF()
      .withColumn("p_user", when(col("p_id") === 800, lit(null)).otherwise(col("p_user")))
    val got = AsOfJoin(l, r, "user", "p_user", "ts", "p_ts")
      .select($"id", $"p_id").collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
    // id=2 (null key) and id=3 (null time) drop; the null-keyed right row
    // (p_id=800) matches nothing
    assert(got === Set((1L, 100L)))
  }

  test("left_outer keeps unmatched and null-keyed left rows, null-extended") {
    val got = AsOfJoin(leftDf, rightDf, "user", "p_user", "ts", "p_ts",
        joinType = "left_outer")
      .select($"id", $"p_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // ids 1 (before any purchase) and 5 (user with no right rows) survive
    // with a null right side instead of dropping
    assert(got === Set((1L, -1L), (2L, 100L), (3L, 100L), (4L, 200L), (5L, -1L)))
  }

  test("duplicate right (key, time) rows match deterministically (greatest tiebreak)") {
    // two right rows with identical (key, time): last-wins must be the one
    // greatest in the appended tiebreak order (p_id), on ANY partitioning
    val r = Seq(R(1L, t(10), 150L), R(1L, t(10), 100L), R(1L, t(10), 120L)).toDF()
    (1 to 8 by 3).foreach { n =>
      val got = AsOfJoin(leftDf.repartition(n), r.repartition(9 - n),
          "user", "p_user", "ts", "p_ts")
        .select($"id", $"p_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got === Set((2L, 150L), (3L, 150L), (4L, 150L)),
        s"nondeterministic tie at repartition($n)")
    }
  }

  test("co-partitioning holds under asymmetric AQE coalescing pressure") {
    // Aggressive coalescing targets would shrink the tiny right exchange
    // far below the left one if AQE touched them independently; the pinned
    // requiredNumPartitions keeps both at the full shuffle width (the
    // doExecute require() throws on any divergence). Skewed left exercises
    // uneven partition sizes.
    val keys = Seq(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64k")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      import org.apache.spark.sql.functions.{col, when}
      val l = spark.range(0, 20000)
        .select(col("id"),
          when(col("id") % 100 === 0, col("id") % 50).otherwise(1L).as("user"),
          (col("id") % 997).as("ts"))
      val r = spark.range(0, 100)
        .select((col("id") % 50).as("p_user"), (col("id") * 7 % 997).as("p_ts"),
          col("id").as("p_id"))
      val got = AsOfJoin(l, r, "user", "p_user", "ts", "p_ts")
        .select(col("id"), col("p_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      // brute-force expected from collected inputs
      val rs = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      val expected = l.collect().flatMap { x =>
        val (id, user, ts) = (x.getLong(0), x.getLong(1), x.getLong(2))
        val cand = rs.filter(p => p._1 == user && p._2 <= ts)
        if (cand.isEmpty) None
        else Some((id, cand.maxBy(p => (p._2, p._3))._3))
      }.toSet
      assert(got === expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("physical plan: AsOfJoinExec over hash exchanges and (key, time) sorts") {
    val df = AsOfJoin(leftDf, rightDf, "user", "p_user", "ts", "p_ts")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin ["), s"custom exec missing:\n$p")
    assert(p.contains("hashpartitioning(user"), s"left not clustered on key:\n$p")
    assert(p.contains("hashpartitioning(p_user"), s"right not clustered on key:\n$p")
    assert(p.contains("Sort [user") && p.contains("ts"), s"sort order missing:\n$p")
  }

  test("as-of query on testdata: every match is the true argmax purchase") {
    val out = graft.operators.Relational.asofJoin(spark, Sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // cross-check a sample against a brute-force computation
    val purchases = Tables.events(spark, Sf0001)
      .filter($"event_type" === "purchase")
      .select($"user_id", org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"),
        $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.take(50).foreach { r =>
      val (uid, tsUs, pId) = (r.getLong(1), r.getLong(2), r.getLong(4))
      val best = purchases.filter(p => p._1 == uid && p._2 <= tsUs)
        .maxBy(p => (p._2, p._3))
      assert(best._3 === pId, s"event ${r.getLong(0)}: expected ${best._3}, got $pId")
    }
  }
}
