package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query names]  — the optional
    // filter is the dev loop (driver always runs the full set)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    // Host cores are ADVERTISED as 32 but the VM is sometimes throttled to
    // ~8 effective cores (measured: a 32-process burn reaches only ~7x
    // speedup at certain hours). Keep thread counts modest so the worst
    // case degrades gracefully instead of thrashing.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(16, Runtime.getRuntime.availableProcessors()).toString)
    // Partition-count agnosticism knobs (SURVEY §6.1 claims scaling is a
    // config change, not a code change — the alt-config gate mode PROVES
    // it): the sweep must hash-match the oracle at shuffle.partitions=8
    // (default dev loop) AND at a cluster-like 200 + AQE.
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "false")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // sf0.01 inputs are tiny; 8 shuffle partitions keeps per-stage task
      // count low so 4 concurrent jobs still fit the task slots
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      // FAIR so the concurrent query jobs below share task slots instead of
      // head-of-line blocking behind whichever large job was submitted first
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bounded-by-construction global rank windows — see the note in Bench
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    // Write the oracle SQL BEFORE running any query: if this process is
    // killed at the driver's wall-clock budget, the comparator can still
    // grade every parquet directory written so far — round 3's CORRECTNESS
    // came back as a contentless {} precisely because the SQL dump used to
    // be the LAST step of this main.
    writeOracleSql(outDir)
    // Queries are independent (each writes its own directory), so run them
    // from a SMALL thread pool — overlapping the per-query planning/codegen
    // gaps. 4 workers × ≤8-task stages ≈ the session's task slots; more
    // workers measurably thrash when the host is throttled.
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }
    val queue = new java.util.concurrent.ConcurrentLinkedQueue(
      scala.jdk.CollectionConverters.SeqHasAsJava(selected.toSeq).asJava)
    val ok = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val failed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val workers = 4
    val threads = (1 to workers).map { _ =>
      new Thread(() => {
        var next = queue.poll()
        while (next != null) {
          val (name, fn) = next
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            ok.add(name)
            System.err.println(
              f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
          } catch { case e: Throwable =>
            failed.add(name)
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
          next = queue.poll()
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    // distinct_users_approx's HLL++ accuracy band is emitted AS DATA by
    // the query itself (within-band booleans hashed against a literal-true
    // oracle), so no side-channel band check lives here anymore — a broken
    // estimator fails the ordinary DuckDB compare.
    writeGate(sfDir, outDir, ok.size,
      scala.jdk.CollectionConverters.SetHasAsScala(failed).asScala.toSeq.sorted,
      shufParts, aqe)
    spark.stop()
  }

  /** Scripted gate record — the registry tallies SURVEY cites, emitted
    * from the registry itself so the numbers can never drift from the
    * code (round-6 finding: hand-written counts drifted twice).
    * Written next to the verify outputs; `tools/gate.py` merges the
    * per-SF records + the sbt test summary into the repo-root GATE.json.
    */
  private def writeGate(sfDir: String, outDir: String,
      okN: Int, failed: Seq[String], shufParts: String, aqe: String): Unit = {
    val names = SparkEntry.queries.keySet
    val oracled = names.intersect(SparkEntry.oracleSql.keySet)
    val rowsOnly = (names -- oracled).toSeq.sorted
    def q(s: String) = "\"" + s + "\""
    val json =
      s"""{"registry_n": ${names.size}, "oracled_n": ${oracled.size},
         | "rows_only": ${rowsOnly.map(q).mkString("[", ", ", "]")},
         | "sf": ${q(sfDir)}, "ran_ok": $okN,
         | "shuffle_partitions": $shufParts, "aqe": $aqe,
         | "failed": ${failed.map(q).mkString("[", ", ", "]")}}
         |""".stripMargin
    Files.writeString(Paths.get(s"$outDir/GATE.json"), json)
  }

  private def writeOracleSql(outDir: String): Unit = {
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
