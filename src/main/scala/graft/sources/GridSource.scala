package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the raster-grid domain — the faithful Spark
  * port of the reference's one real optimization: translating query
  * predicates into a NetCDF hyperslab *section read* so only the requested
  * `[t, y, x]` ranges are ever materialized (`Gddp.scala:206-226`,
  * README.md:96-108).
  *
  * - `SupportsPushDownRequiredColumns` ⇒ only requested variables/coords are
  *   generated (the reference's variable projection, `Gddp.scala:134-137`).
  * - `SupportsPushDownFilters` ⇒ range predicates on t/y/x (and equality on
  *   variable) shrink the generation loops — the section read. Pushed filters
  *   are *fully* handled for those columns; everything else stays in Spark.
  * - One `InputPartition` per (variable, t) slice — the natural NetCDF chunk
  *   unit; a real file-backed source would open one file region per
  *   partition. Partitions whose slice is excluded by pushed filters are
  *   never planned, which is file/partition pruning (F1).
  *
  * The generated grid is `GridData.cells` minus the `file` column (same
  * closed form), so correctness is oracle-checkable against the DuckDB
  * generator.
  */
class GridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GridSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new GridTable
}

object GridSource {
  import graft.domain.GridData.{T, X, Y}

  val schema: StructType = StructType(Seq(
    StructField("variable", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = true)))

  val epochMicros: Long = java.time.Instant.parse("1990-01-01T00:00:00Z").toEpochMilli * 1000L

  def tsMicros(t: Int): Long = epochMicros + t.toLong * 24 * 3600 * 1000000L

  /** Inclusive index bounds per dimension, narrowed by pushed filters. */
  case class Section(
    vars: Set[Int] = Set(0, 1),
    t0: Int = 0, t1: Int = T - 1,
    y0: Int = 0, y1: Int = Y - 1,
    x0: Int = 0, x1: Int = X - 1) {

    def narrow(f: Filter): Option[Section] = f match {
      case EqualTo("variable", v: String) =>
        val id = if (v == "tasmax") 0 else if (v == "tasmin") 1 else -1
        Some(copy(vars = vars.filter(_ == id)))
      case In("variable", vs) =>
        val ids = vs.collect { case "tasmax" => 0; case "tasmin" => 1 }.toSet
        Some(copy(vars = vars.intersect(ids)))
      case GreaterThanOrEqual("y", v: Int) => Some(copy(y0 = math.max(y0, v)))
      case GreaterThan("y", v: Int) => Some(copy(y0 = math.max(y0, v + 1)))
      case LessThanOrEqual("y", v: Int) => Some(copy(y1 = math.min(y1, v)))
      case LessThan("y", v: Int) => Some(copy(y1 = math.min(y1, v - 1)))
      case GreaterThanOrEqual("x", v: Int) => Some(copy(x0 = math.max(x0, v)))
      case GreaterThan("x", v: Int) => Some(copy(x0 = math.max(x0, v + 1)))
      case LessThanOrEqual("x", v: Int) => Some(copy(x1 = math.min(x1, v)))
      case LessThan("x", v: Int) => Some(copy(x1 = math.min(x1, v - 1)))
      case GreaterThanOrEqual("ts", ts) => tsToT(ts).map(t => copy(t0 = math.max(t0, t)))
      case LessThanOrEqual("ts", ts) => tsToT(ts).map(t => copy(t1 = math.min(t1, t)))
      case GreaterThan("ts", ts) => tsToT(ts).map(t => copy(t0 = math.max(t0, t + 1)))
      case LessThan("ts", ts) => tsToT(ts).map(t => copy(t1 = math.min(t1, t - 1)))
      case _ => None
    }

    /** day index containing the timestamp bound (conservative: callers clamp
      * with ceil/floor via the +1/-1 in narrow's strict cases).
      */
    private def tsToT(v: Any): Option[Int] = v match {
      case t: java.sql.Timestamp =>
        Some(math.floor((t.getTime * 1000L - epochMicros) / (24.0 * 3600 * 1000000L)).toInt)
      case i: java.time.Instant =>
        Some(math.floor((i.toEpochMilli * 1000L - epochMicros) / (24.0 * 3600 * 1000000L)).toInt)
      case _ => None
    }
  }
}

class GridTable extends Table with SupportsRead {
  override def name(): String = "graft_grid"
  override def schema(): StructType = GridSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder
}

class GridScanBuilder extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var section = GridSource.Section()
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GridSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, rest) = filters.partition { f =>
      section.narrow(f) match {
        case Some(s) => section = s; true
        case None => false
      }
    }
    pushed = handled
    rest // Spark re-evaluates these; handled ones are fully enforced here
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GridScan(section, required, pushed)
}

class GridScan(section: GridSource.Section, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GridScan section=$section pushed=[${pushed.mkString(", ")}]"

  /** One partition per (variable, t) slice inside the section — excluded
    * slices are never planned (partition pruning).
    */
  override def planInputPartitions(): Array[InputPartition] =
    (for {
      v <- section.vars.toSeq.sorted
      t <- section.t0 to section.t1
    } yield GridPartition(v, t, section): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = new GridReaderFactory(required)
}

case class GridPartition(v: Int, t: Int, section: GridSource.Section) extends InputPartition

class GridReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GridReader(p.asInstanceOf[GridPartition], required)
}

/** Generates exactly the section's `[y0..y1, x0..x1]` cells for its
  * (variable, t) slice — the hyperslab read.
  */
class GridReader(p: GridPartition, required: StructType) extends PartitionReader[InternalRow] {
  private val s = p.section
  private var y = s.y0
  private var x = s.x0 - 1
  private val fieldGen: Array[(Int, Int) => Any] = required.fields.map { f =>
    f.name match {
      case "variable" => (_: Int, _: Int) =>
        UTF8String.fromString(if (p.v == 0) "tasmax" else "tasmin")
      case "ts" => (_: Int, _: Int) => GridSource.tsMicros(p.t)
      case "y" => (yy: Int, _: Int) => yy
      case "x" => (_: Int, xx: Int) => xx
      case "lat" => (yy: Int, _: Int) => 44.0 + yy * 0.05
      case "lon" => (_: Int, xx: Int) => -80.0 + xx * 0.05
      case "value" => (yy: Int, xx: Int) =>
        if ((p.t + yy + xx) % 17 == 0) null
        else ((p.t * 31 + yy * 7 + xx * 13 + p.v * 5) % 100).toDouble / 2.0 - 10.0
    }
  }

  override def next(): Boolean = {
    x += 1
    if (x > s.x1) { x = s.x0; y += 1 }
    y <= s.y1
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(fieldGen.toSeq.map(g => g(y, x)))

  override def close(): Unit = ()
}
