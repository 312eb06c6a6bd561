package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale tooling: the two shuffle-shaping techniques a 100 TB deployment
  * leans on beyond what AQE does automatically — explicit key salting for
  * pathological skew, and bucketed tables for shuffle-free co-located
  * joins. Kept as library operators (not query rewrites) so pipelines opt
  * in per join; plans stay pure Column expressions.
  */
object Scale {

  /** Skew diagnostic: per-key row counts of the heaviest `k` keys with
    * their share of the table — the number you look at before deciding to
    * salt. One partial-aggregated shuffle + a k-row top-k merge. */
  def skewProfile(df: DataFrame, key: String, k: Int = 20): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(k)
      .withColumn("share", col("n") / lit(total.toDouble))
  }

  /** Salted inner equi-join for skewed fact–fact joins (neither side
    * broadcastable, hot keys overwhelm single reducers).
    *
    * The skewed (left) side gets a deterministic salt in `[0, saltFactor)`
    * hashed from a disambiguating column — NOT `rand()`, which would make
    * retried tasks emit different rows and break exactly-once sinks. The
    * right side is replicated `saltFactor`× via `explode`, so every
    * (key, salt) bucket holds the full right-side key group and the join
    * result is exactly the unsalted join, with hot keys spread over
    * `saltFactor` reducers.
    *
    * Use when AQE's skew splitting isn't available (e.g. the skewed join
    * feeds a co-partitioned downstream op) or the skew is known up front.
    */
  def saltedEquiJoin(
      left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, leftSaltBy: String): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(leftSaltBy)), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop("__salt").drop(replicated(key))
  }

  /** Declared-query form of [[saltedEquiJoin]]: lineitem ⋈ orders on the
    * order key with saltFactor=8. Salting must be semantically transparent
    * — the DuckDB oracle for this query is the PLAIN join, so the oracle
    * gate proves the salted plan returns exactly the unsalted result. */
  def saltedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    val o = graft.Tables.orders(spark, dir)
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    saltedEquiJoin(li, o, "l_orderkey", saltFactor = 8, leftSaltBy = "l_linenumber")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"o_totalprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Write `df` bucketed+sorted by `key` into `numBuckets` buckets as a
    * managed table. Two tables bucketed the same way join with ZERO
    * shuffle — at 100 TB this turns every repeated fact–fact join on the
    * bucket key into a map-side merge (see the plan test in ScaleSpec).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket key —
    * shuffle-free when `spark.sql.sources.bucketing.enabled` (default). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(key) === r(key)).drop(r(key))
  }
}
