package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (lazy; UTC; small shuffle count).
  *
  * `SPARK_GRAFT_STATESTORE=rocksdb` swaps every stateful streaming
  * operator in the suite onto the RocksDB state store with changelog
  * checkpointing — exactly the two knobs `conf/cluster-100tb.conf`
  * prescribes — so the whole streaming-twin manifest can be re-proven
  * under the cluster state backend as a pure config sweep (the gate's
  * `rocksdb_twins` phase). Default (unset) keeps the in-memory HDFS
  * provider. */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName(getClass.getSimpleName)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"/tmp/graft-warehouse-${getClass.getSimpleName}")
      .config("spark.ui.enabled", "false")
    val withStore =
      if (sys.env.get("SPARK_GRAFT_STATESTORE").contains("rocksdb"))
        b.config("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
          .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true")
      else b
    withStore.getOrCreate()
  }

  val Sf0001 = "/root/testdata/sf0.001"
}
