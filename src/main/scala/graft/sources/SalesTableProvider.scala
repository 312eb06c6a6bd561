package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's synthetic sales generator
  * (A1, golang/chapter_4/sales/sales_data_source.go:10-33) — the full
  * connector surface a real source plugs in through, not just a
  * `spark.range` projection: schema inference, options (`rows`,
  * `partitions`), executor-side partition planning (each input partition
  * generates its own id range — nothing materializes on the driver), and
  * column pruning pushed INTO the reader (a pruned scan never computes the
  * dropped columns — visible as the scan's output attribute list).
  *
  * Row values are generator-identical to
  * [[SyntheticSources.productTransactions]] (parity-tested), so the same
  * data can be read either way:
  * {{{ spark.read.format("graft-sales").option("rows", "1000000000").load() }}}
  *
  * Scale: partitions default to the session's parallelism knob at the call
  * site; 10^11 rows is a config change, the driver only ever holds
  * (start, end) pairs.
  */
class SalesTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sales"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SalesTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    def longOpt(key: String, default: String): Long = {
      val v = properties.getOrDefault(key, default)
      try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft-sales option '$key' must be an integer, got '$v'")
      }
    }
    new SalesTable(longOpt("rows", "10"), longOpt("partitions", "1").toInt)
  }
}

object SalesTable {
  val Schema: StructType = StructType(Seq(
    StructField("row_id", LongType, nullable = false),
    StructField("customer_name", StringType, nullable = false),
    StructField("product_name", StringType, nullable = false),
    StructField("quantity", IntegerType, nullable = false),
    StructField("price", DoubleType, nullable = false)))

  // Same literal pools as SyntheticSources (reference's constant fixtures).
  val Customers: Array[String] = Array("Barney Rubble", "Fred Flintstone",
    "Wilma Flintstone", "Betty Rubble", "Pebbles Flintstone")
  val Products: Array[String] = Array("quarter pounder", "blue jeans",
    "red shirt", "black shoes", "tan pants")

  /** Field value for global row i — kept generator-identical to
    * [[SyntheticSources.productTransactions]] (Spark's `round(_, 2)` is
    * BigDecimal HALF_UP, mirrored here). */
  def value(i: Long, field: String): Any = field match {
    case "row_id"        => i
    case "customer_name" => UTF8String.fromString(Customers((i % 5).toInt))
    case "product_name"  => UTF8String.fromString(Products(((i % 7) % 5).toInt))
    case "quantity"      => (i % 10 + 1).toInt
    // BigDecimal.valueOf (shortest decimal repr), NOT the exact-binary
    // constructor: Spark's Round does valueOf, and the two disagree on
    // decimal ties (2.675 vs 2.67499...)
    case "price" => java.math.BigDecimal.valueOf(i % 997 * 0.37 + 1.0)
      .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

class SalesTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_sales(rows=$rows, partitions=$parts)"
  override def schema(): StructType = SalesTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SalesScanBuilder(rows, parts,
      options.getOrDefault("rowsPerBatch", "10").toLong)
}

class SalesScanBuilder(rows: Long, parts: Int, rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._
  private var required: StructType = SalesTable.Schema
  private var lo: Long = 0L
  private var hi: Long = Long.MaxValue
  private var accepted: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT pushdown: any n generated ids are a valid LIMIT n result, so
    * cap the id window at lo+n and report fully-pushed — `LIMIT 10` over
    * a 10^11-row source plans one tiny range instead of scanning. Runs
    * AFTER filter pushdown in Spark's pushdown order, so the cap
    * composes with a pushed row_id window. */
  override def pushLimit(limit: Int): Boolean = {
    if (hi == Long.MaxValue || hi - lo > limit) hi = lo + limit
    true
  }

  /** Filter pushdown on the generator's own index: `row_id` range/equality
    * predicates tighten the [lo, hi) id window BEFORE partition planning,
    * so a `WHERE row_id BETWEEN a AND b` over a 10^11-row source plans
    * only the overlapping ranges and never generates a skipped row — the
    * DSv2 analogue of parquet row-group pruning, and EXACT here (row_id
    * IS the generator index), so accepted filters are fully handled and
    * never re-evaluated post-scan. Everything else stays unhandled and
    * Spark filters it after the read. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, theirs) = filters.partition {
      case EqualTo("row_id", _: Long)             => true
      case GreaterThan("row_id", _: Long)         => true
      case GreaterThanOrEqual("row_id", _: Long)  => true
      case LessThan("row_id", _: Long)            => true
      case LessThanOrEqual("row_id", _: Long)     => true
      case IsNotNull("row_id")                    => true // never null
      case _ => false
    }
    ours.foreach {
      case EqualTo(_, v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan(_, v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual(_, v: Long) => lo = math.max(lo, v)
      case LessThan(_, v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual(_, v: Long)    => hi = math.min(hi, v + 1)
      case _ => ()
    }
    accepted = ours
    theirs
  }
  override def pushedFilters(): Array[Filter] = accepted

  /** COUNT(*)/MIN(row_id)/MAX(row_id) pushdown: the generator KNOWS its
    * cardinality and its id bounds (the pushed [lo, hi) window), so any
    * ungrouped combination of those aggregates is answered from
    * metadata — one 1-row partition, zero rows generated, the aggregate
    * rewritten away (complete pushdown). The DSv2 analogue of answering
    * COUNT/MIN/MAX from parquet footer statistics. Anything else (a
    * grouped agg, MIN over a generated column) is declined and Spark
    * computes it over the scan. */
  private def aggKinds(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Array[String]] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    def rowIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case r: NamedReference => r.fieldNames.sameElements(Array("row_id"))
        case _                 => false
      }
    if (agg.groupByExpressions.nonEmpty || agg.aggregateExpressions.isEmpty)
      return None
    val kinds = agg.aggregateExpressions.map {
      case _: CountStar                  => "count"
      case m: Min if rowIdRef(m.column)  => "min"
      case m: Max if rowIdRef(m.column)  => "max"
      case _                             => return None
    }
    Some(kinds)
  }
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = aggKinds(agg) match {
    case Some(kinds) => pushedAggKinds = kinds; true
    case None        => false
  }
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = aggKinds(agg).isDefined
  private var pushedAggKinds: Array[String] = Array.empty

  override def build(): Scan =
    new SalesScan(rows, parts, rowsPerBatch, required, lo, math.min(hi, rows),
      pushedAggKinds)
}

case class SalesRange(start: Long, end: Long) extends InputPartition

class SalesScan(rows: Long, parts: Int, rowsPerBatch: Long,
    required: StructType, lo: Long = 0L, hiOpt: Long = Long.MaxValue,
    aggKinds: Array[String] = Array.empty)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  private val hi = math.min(hiOpt, rows)
  private def aggLabel(kind: String): String = kind match {
    case "count" => "count(*)"
    case k       => s"$k(row_id)"
  }
  override def readSchema(): StructType =
    if (aggKinds.nonEmpty)
      StructType(aggKinds.zipWithIndex.map { case (k, i) =>
        // MIN/MAX of an empty window are NULL; COUNT never is
        StructField(s"agg$i", LongType, nullable = k != "count")
      }.toIndexedSeq)
    else required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-sales rows=$rows cols=${required.fieldNames.mkString(",")} " +
      s"rowBounds=[$lo,$hi)" +
      (if (aggKinds.nonEmpty) s" agg=${aggKinds.map(aggLabel).mkString(",")}"
       else "")
  override def planInputPartitions(): Array[InputPartition] = {
    if (aggKinds.nonEmpty) return Array(SalesRange(0L, 0L)) // 1 metadata-row partition
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0L until rows by per)
      .map(s => SalesRange(math.max(s, lo), math.min(math.min(rows, s + per), hi)))
      .filter(r => r.start < r.end)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    if (aggKinds.nonEmpty) {
      val empty = hi <= lo
      new SalesAggReaderFactory(aggKinds.map {
        case "count" => math.max(0L, hi - lo): Any
        case "min"   => if (empty) null else (lo: Any)
        case "max"   => if (empty) null else (hi - 1: Any)
      })
    } else new SalesReaderFactory(required.fieldNames)
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new SalesMicroBatchStream(rows, rowsPerBatch, required.fieldNames)

  /** Exact statistics (the generator knows its cardinality): bounds-aware
    * row count + a per-row byte estimate, so Catalyst's join planning
    * (broadcast threshold, AQE) sees the truth instead of defaulting to
    * "unknown = huge". */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * 48L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }
}

/** Micro-batch stream over the same generator: the offset is simply "rows
  * emitted so far", each trigger advances by `rowsPerBatch` (the
  * reference's 10-records-per-3s produce loop, A1+A31), and a batch replay
  * regenerates exactly the same id range — deterministic replay is what
  * makes the checkpoint contract exactly-once into tracked sinks. Under
  * Trigger.AvailableNow the prepared target is the full row budget,
  * drained in admission-controlled `rowsPerBatch` steps: the engine keeps
  * firing micro-batches until the offset stops advancing, so the drain
  * takes ⌈rows/rowsPerBatch⌉ batches — the same per-trigger cap as
  * continuous operation, as a run-once backfill should behave. */
class SalesMicroBatchStream(rows: Long, rowsPerBatch: Long, fields: Array[String])
    extends streaming.MicroBatchStream with streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset
  private case class SalesOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }
  // The prepared AvailableNow target IS the row budget `rows`, which
  // latestOffset already never exceeds — nothing extra to record.
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def initialOffset(): Offset = SalesOffset(0L)
  // SupportsAdmissionControl path (the one the engine actually calls):
  // advance from the committed start by one rowsPerBatch step, never past
  // the row budget — in AvailableNow and continuous operation alike
  override def latestOffset(start: Offset,
      limit: streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[SalesOffset].n
    SalesOffset(math.min(rows, s + rowsPerBatch))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")
  override def deserializeOffset(json: String): Offset = SalesOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[SalesOffset].n, end.asInstanceOf[SalesOffset].n)
    if (s >= e) Array.empty else Array(SalesRange(s, e))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SalesReaderFactory(fields)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Emits the single metadata-answered aggregate row (COUNT/MIN/MAX
  * values precomputed from the scan's [lo, hi) window). */
class SalesAggReaderFactory(values: Array[Any]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val go = !emitted; emitted = true; go }
      override def get(): InternalRow = InternalRow.fromSeq(values.toIndexedSeq)
      override def close(): Unit = ()
    }
}

class SalesReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[SalesRange]
    new PartitionReader[InternalRow] {
      private var i = range.start - 1
      override def next(): Boolean = { i += 1; i < range.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toIndexedSeq.map(f => SalesTable.value(i, f)))
      override def close(): Unit = ()
    }
  }
}
