package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType}
import org.apache.parquet.schema.LogicalTypeAnnotation.{StringLogicalTypeAnnotation, TimeUnit, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{And => FAnd, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector with ENGINE-SIDE pushdown — the process-
  * boundary seam the reference's architecture names: every reference
  * query crosses one search POST (`lib/es_client.ts:25-27`) carrying
  * the query (filters) and `fields` (projection), and Elasticsearch
  * evaluates both server-side. This connector reproduces that contract
  * against the harness's parquet fixtures: it implements
  * `SupportsPushDownFilters` + `SupportsPushDownRequiredColumns`, so
  * the Catalyst filters the [[graft.plans.QueryDsl]] compiler (or any
  * pipeline) produces reach the "server" — visible in the plan as
  * `PushedFilters: [...]` on the BatchScan — instead of being applied
  * after a full read.
  *
  * What "server-side" means here, and why it is the 100 TB shape:
  *   - '''Row-group pruning''': `planInputPartitions` reads each file
  *     footer and drops whole row groups whose column min/max stats
  *     are disjoint from the pushed comparison/equality predicates —
  *     one InputPartition per SURVIVING row group, so a time-bounded
  *     query over a year of data schedules only the matching slices
  *     (the analog of ES skipping non-matching shards/segments).
  *   - '''Column pruning''': the reader requests only the pruned
  *     column set from the parquet row group; unprojected column
  *     chunks are never read (ES `_source: false` + `fields`).
  *   - '''Row-level evaluation''': the reader applies the pushed
  *     predicates before a row crosses the connector boundary, like ES
  *     matching the query before building a hit. Spark re-evaluates
  *     residual filters above the scan (same belt-and-braces contract
  *     as the built-in parquet source), so connector evaluation can
  *     never change semantics — only reduce boundary rows.
  *   - '''Statistics''': `estimateStatistics` reports the surviving
  *     row groups' byte/row totals, so the cost-based planner can
  *     broadcast a filtered connector read it would otherwise
  *     size-estimate at the table's full width.
  *
  * Wire-surface scope: scalar columns (INT32/INT64/FLOAT/DOUBLE/
  * BOOLEAN/UTF8 strings, and INT64 timestamps — MICROS map to the
  * TIMESTAMP/TIMESTAMP_NTZ types per `isAdjustedToUTC`, MILLIS
  * normalize to micros at the read/prune boundary, NANOS map to a
  * raw nanos LONG exactly like the session's `nanosAsLong` convention,
  * so [[Tables.eventsFrom]] normalizes a connector read and a native
  * parquet read identically) plus LISTS of non-timestamp primitives —
  * ES `fields` responses are array-valued by definition (SURVEY §1.3
  * P3) and the reference's asset docs carry `array<string>` edge lists
  * (`lib/types.ts:7-9`), so the hit envelope round-trips. Deeper
  * nesting is rejected at schema inference: this seam models the
  * reference's hit envelope, not a general lakehouse format.
  */
final class EsShapedSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "es-shaped"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = EsShaped.sessionConf()
    val paths = EsShaped.paths(options)
    require(paths.nonEmpty, "es-shaped source needs at least one path")
    val files = paths.flatMap(EsShaped.dataFiles(_, conf))
    require(files.nonEmpty, s"es-shaped source found no data files in $paths")
    EsShaped.sparkSchema(EsShaped.withFooter(files.head, conf)(_.getFooter
      .getFileMetaData.getSchema))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new EsShapedTable(schema,
      EsShaped.paths(new CaseInsensitiveStringMap(properties)))
}

private final class EsShapedTable(tableSchema: StructType,
    paths: Seq[String]) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"es-shaped(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EsShapedScanBuilder(tableSchema, paths)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new EsShapedWriteBuilder(paths, info)
}

private final class EsShapedScanBuilder(tableSchema: StructType,
    paths: Seq[String]) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var preds: Seq[EsShaped.Pred] = Nil

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, _) = filters.partition(f => EsShaped.toPred(f, tableSchema).isDefined)
    pushed = ok
    preds = ok.flatMap(f => EsShaped.toPred(f, tableSchema)).toSeq
    // every filter stays post-scan too (the parquet source's contract):
    // connector evaluation reduces boundary rows, never owns semantics
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new EsShapedScan(tableSchema, required, paths, pushed, preds)
}

private final class EsShapedScan(tableSchema: StructType,
    required: StructType, paths: Seq[String], pushed: Array[Filter],
    preds: Seq[EsShaped.Pred]) extends Scan with Batch
    with SupportsReportStatistics {

  // the SESSION's hadoop configuration (spark.hadoop.* — filesystem
  // credentials, endpoints), captured once at plan time and shipped
  // serialized to the executor-side readers: a connector that builds
  // bare `new Configuration()`s works on local fixtures but breaks on
  // any configured filesystem
  private val conf = EsShaped.sessionConf()
  private val confShip = new EsShaped.SerializableConf(conf)

  override def readSchema(): StructType = required

  override def description(): String =
    s"EsShaped PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  /** Row-group partitions surviving stats pruning for an explicit file
    * set — shared by the batch path and the streaming per-generation
    * slices.
    */
  private def partitionsOf(files: Seq[String]): Seq[EsShapedPartition] =
    files.flatMap { p =>
      EsShaped.withFooter(p, conf) { r =>
        r.getFooter.getBlocks.asScala.toList.zipWithIndex.collect {
          case (b, i) if EsShaped.blockSurvives(b, preds, tableSchema) =>
            EsShapedPartition(p, i, b.getRowCount, b.getTotalByteSize)
        }
      }
    }

  /** One partition per row group SURVIVING stats pruning — the
    * connector's shard/segment-skip analog, decided entirely from
    * footers on the driver (no data read).
    */
  private lazy val survivors: Seq[EsShapedPartition] =
    partitionsOf(paths.flatMap(EsShaped.dataFiles(_, conf)))

  override def planInputPartitions(): Array[InputPartition] =
    survivors.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new EsShapedReaderFactory(tableSchema, required, preds, confShip)

  /** The generation log as a STREAMING SOURCE (the write side's
    * changefeed): offsets are generation numbers — strictly increasing
    * by construction ([[EsShaped.nextGeneration]] is max+1 and a
    * compacted base outnumbers everything it folded — so a micro-batch
    * is exactly the chain slices published since the last offset.
    * Each upsert delta arrives as its O(batch) slice; a compaction
    * re-emits the collapsed state as one snapshot slice (Kafka
    * log-compaction semantics: consumers see a full re-image, never a
    * gap). Pushdown/pruning apply per slice, same as batch.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(paths.size == 1,
      s"es-shaped streaming read needs exactly one index path, got $paths")
    new EsShapedMicroBatchStream(paths.head, conf, partitionsOf,
      () => new EsShapedReaderFactory(tableSchema, required, preds, confShip))
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(1L, survivors.map(_.bytes).sum *
        math.max(1, required.size) / math.max(1, tableSchema.size)))
    override def numRows(): OptionalLong =
      OptionalLong.of(survivors.map(_.rows).sum)
  }
}

private final case class EsShapedStreamOffset(maxGen: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = maxGen.toString
}

/** Micro-batch stream over an index's generation chain: poll the
  * pointer, emit the row groups of every live generation numbered
  * above the last offset. Planning is footer-only (the batch path's
  * discipline); slices vacuumed between polls are simply no longer in
  * the chain — the offset contract never references them.
  */
private final class EsShapedMicroBatchStream(path: String,
    conf: Configuration,
    partitionsOf: Seq[String] => Seq[EsShapedPartition],
    factory: () => PartitionReaderFactory)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.Offset

  private def currentMax: Int =
    EsShaped.liveGenerations(path, conf)._1.lastOption.getOrElse(0)

  // Trigger.AvailableNow pins the end offset at preparation time: the
  // drain processes everything published up to the trigger and stops,
  // even if the single writer keeps publishing during the run
  private var availableEnd: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableEnd = Some(currentMax)

  override def initialOffset(): Offset = EsShapedStreamOffset(0)

  override def latestOffset(): Offset =
    EsShapedStreamOffset(availableEnd.getOrElse(currentMax))

  // SupportsAdmissionControl (via SupportsTriggerAvailableNow): no
  // rate limiting — a generation is the atomic publish unit, so every
  // micro-batch takes all slices up to the pinned/current end
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()

  override def reportLatestOffset(): Offset = EsShapedStreamOffset(currentMax)

  override def deserializeOffset(json: String): Offset =
    EsShapedStreamOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[EsShapedStreamOffset].maxGen
    val hi = end.asInstanceOf[EsShapedStreamOffset].maxGen
    val gens = EsShaped.liveGenerations(path, conf)._1
      .filter(g => g > lo && g <= hi)
    partitionsOf(gens.flatMap(g => EsShaped.dataFiles(
      new Path(path, EsShapedSink.genDirName(g)).toString, conf))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = factory()

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

private final case class EsShapedPartition(path: String, rowGroup: Int,
    rows: Long, bytes: Long) extends InputPartition

private final class EsShapedReaderFactory(tableSchema: StructType,
    required: StructType, preds: Seq[EsShaped.Pred],
    conf: EsShaped.SerializableConf) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[EsShapedPartition]
    if (required.isEmpty && preds.isEmpty)
      // pure-count read (no columns, no predicates): rows exist only as
      // a footer rowcount — metadata-only, like ES hits.total
      new EsShapedCountReader(part.rows)
    else new EsShapedRowGroupReader(part, tableSchema, required, preds,
      conf.value)
  }
}

private final class EsShapedCountReader(total: Long)
    extends PartitionReader[InternalRow] {
  private var emitted = 0L
  private val empty = new GenericInternalRow(0)
  override def next(): Boolean = { emitted += 1; emitted <= total }
  override def get(): InternalRow = empty
  override def close(): Unit = ()
}

/** Reads ONE row group with the pruned column projection, evaluating
  * the pushed predicates per row before emission.
  */
private final class EsShapedRowGroupReader(part: EsShapedPartition,
    tableSchema: StructType, required: StructType,
    preds: Seq[EsShaped.Pred], conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val reader = ParquetFileReader.open(
    HadoopInputFile.fromPath(new Path(part.path), conf))
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema

  // projection = pruned output columns ∪ predicate columns (parquet
  // reads only these column chunks); a table-schema column ABSENT from
  // this file null-fills below (the native parquet source's
  // heterogeneous-file behavior) instead of crashing the projection
  private val neededNames: Seq[String] =
    (required.fieldNames.toSeq ++ preds.map(_.col)).distinct
      .filter(fileSchema.containsField)
  private val projection = new MessageType(fileSchema.getName,
    neededNames.map(n =>
      fileSchema.getType(fileSchema.getFieldIndex(n))): _*)

  reader.setRequestedSchema(projection)
  (0 until part.rowGroup).foreach(_ => reader.skipNextRowGroup())
  private val pages = reader.readNextRowGroup()
  private val recordReader = new ColumnIOFactory().getColumnIO(projection)
    .getRecordReader(pages, new GroupRecordConverter(projection))
  private var remaining: Long = pages.getRowCount

  // per-needed-column extraction: projection index + spark type;
  // -1 = column missing from this file → null
  private val types: Map[String, DataType] =
    tableSchema.fields.map(f => f.name -> f.dataType).toMap
  private val projIdx: Map[String, Int] = neededNames.zipWithIndex.toMap
  private val outCols: Array[(Int, DataType)] =
    required.fieldNames.map(n => projIdx.getOrElse(n, -1) -> types(n))
  private val predCols: Array[(EsShaped.Pred, Int)] =
    preds.map(pr => pr -> projIdx.getOrElse(pr.col, -1)).toArray

  // MILLIS-encoded INT64 timestamps normalize to the micros domain
  // InternalRow (and every pushed-predicate constant) expects
  private val toMicros: Array[Long] =
    neededNames.map(n => EsShaped.microsScale(
      projection.getType(projection.getFieldIndex(n)))).toArray

  private var current: InternalRow = _

  private def value(g: org.apache.parquet.example.data.Group,
      idx: Int): Any =
    if (g.getFieldRepetitionCount(idx) == 0) null
    else if (!projection.getType(idx).isPrimitive)
      EsShaped.arrayValue(g.getGroup(idx, 0),
        projection.getType(idx).asGroupType())
    else projection.getType(idx).asPrimitiveType().getPrimitiveTypeName match {
      case INT64 => g.getLong(idx, 0) * toMicros(idx)
      case INT32 => g.getInteger(idx, 0)
      case DOUBLE => g.getDouble(idx, 0)
      case FLOAT => g.getFloat(idx, 0)
      case BOOLEAN => g.getBoolean(idx, 0)
      case BINARY => g.getBinary(idx, 0).toStringUsingUTF8
      case other => throw new UnsupportedOperationException(
        s"es-shaped: unsupported physical type $other")
    }

  override def next(): Boolean = {
    while (remaining > 0) {
      remaining -= 1
      val g = recordReader.read()
      if (predCols.forall { case (pr, i) =>
            pr.eval(if (i < 0) null else value(g, i)) }) {
        val out = new Array[Any](outCols.length)
        var j = 0
        while (j < outCols.length) {
          val (i, dt) = outCols(j)
          val v = if (i < 0) null else value(g, i)
          out(j) = dt match {
            case StringType => if (v == null) null
              else UTF8String.fromString(v.asInstanceOf[String])
            case _ => v
          }
          j += 1
        }
        current = new GenericInternalRow(out)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** Schema mapping, predicate translation, and row-group stats pruning
  * shared by the driver (planning) and executor (read) sides.
  */
private[graft] object EsShaped {

  /** The active session's hadoop configuration (carries spark.hadoop.*
    * — filesystem credentials, endpoints) when a session exists; the
    * bare default only outside any session (tooling).
    */
  def sessionConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Hadoop Configuration is not serializable; this ships its ENTRIES
    * to the executor-side readers and rebuilds there (loadDefaults =
    * false: the captured entries already include them).
    */
  final class SerializableConf(@transient private var conf: Configuration)
      extends Serializable {
    private val entries: Array[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray
    @transient private lazy val rebuilt: Configuration = {
      val c = new Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      c
    }
    def value: Configuration = if (conf != null) conf else rebuilt
  }

  def withFooter[T](path: String, conf: Configuration)
      (f: ParquetFileReader => T): T = {
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf))
    try f(r) finally r.close()
  }

  /** A path entry may be a parquet FILE, a DIRECTORY of part files
    * (how Spark writes a table), or a CONNECTOR-WRITTEN INDEX (a
    * `_latest` pointer naming the live generation CHAIN — a base
    * `gen-N/` snapshot plus any upsert delta slices; only published
    * generations are visible, staged or aborted generations are
    * unreferenced by construction). A raw scan of a multi-generation
    * index returns the UNION of the chain's files — the segment-log
    * view, like reading ES's raw segments; the id-collapsed search
    * view is [[EsShapedSink.read]]. Plain directories expand to their
    * data files (deterministic name order), skipping `_SUCCESS`/hidden
    * entries. An empty directory contributes nothing.
    */
  def dataFiles(path: String, conf: Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) Seq(path)
    else {
      val (gens, _) = liveGenerations(path, conf)
      if (gens.nonEmpty)
        gens.flatMap(g =>
          dataFiles(new Path(p, EsShapedSink.genDirName(g)).toString, conf))
      else
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          .map(_.getPath.toString).sorted
    }
  }

  // --- Write-protocol helpers (shared with EsShapedSink) ---------------

  /** The live generation CHAIN of a connector-written index (apply
    * order: base snapshot first, delta slices after) plus the upsert
    * id column recorded when the chain carries deltas. `(Nil, None)`
    * for a plain directory / empty index. Pointer format: line 1 a
    * comma-separated ascending generation list (the legacy single
    * `"N"` is a one-element chain), optional line 2 the id column.
    */
  def liveGenerations(path: String,
      conf: Configuration): (Seq[Int], Option[String]) = {
    val p = new Path(path, EsShapedSink.LatestPointer)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) (Nil, None)
    else {
      val in = fs.open(p)
      try {
        val s = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        val lines = s.split("\n").toSeq
        val gens = lines.head.split(",").toSeq.map(_.trim.toInt)
        (gens, lines.drop(1).headOption.map(_.trim).filter(_.nonEmpty))
      } finally in.close()
    }
  }

  /** The newest generation of the live chain — the single-snapshot
    * view callers that only need "is there live state / what would a
    * fresh overwrite replace" key on.
    */
  def liveGeneration(path: String, conf: Configuration): Option[Int] =
    liveGenerations(path, conf)._1.lastOption

  /** Next free generation number: max over existing `gen-N` dirs + 1
    * (deterministic — never wall-clock; single-writer by contract).
    */
  def nextGeneration(path: String, conf: Configuration): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) 1
    else {
      val gens = fs.listStatus(p).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("gen-") => n.drop(4).toInt }
      if (gens.isEmpty) 1 else gens.max + 1
    }
  }

  /** Swap the `_latest` pointer to the given chain — the publish step
    * readers key on. Written to a temp file and RENAMED over the
    * pointer (atomic on the filesystems in scope), so a reader racing
    * the single writer sees either the old chain or the new one,
    * never a truncated pointer.
    */
  def publishPointer(path: String, gens: Seq[Int], idCol: Option[String],
      conf: Configuration): Unit = {
    require(gens.nonEmpty, "cannot publish an empty generation chain")
    val dir = new Path(path)
    val tmp = new Path(dir, s"${EsShapedSink.LatestPointer}.tmp")
    val dst = new Path(dir, EsShapedSink.LatestPointer)
    val fs = dir.getFileSystem(conf)
    val body = gens.mkString(",") + idCol.fold("")("\n" + _)
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Keep only the `committed` file names in a staged generation
    * directory — the commit-side guard against task attempts that died
    * WITHOUT abort() (executor crash, retry under a new taskId):
    * their orphan part files must not publish with the generation, or
    * readers would see duplicate rows / a truncated parquet file.
    * Creates the directory when no writer ran (a zero-partition
    * frame), so the published generation is a valid empty snapshot.
    */
  def pruneStage(genDir: Path, committed: Set[String],
      conf: Configuration): Unit = {
    val fs = genDir.getFileSystem(conf)
    if (!fs.exists(genDir)) { fs.mkdirs(genDir); () }
    fs.listStatus(genDir).toSeq
      .filter(s => s.isFile && !committed.contains(s.getPath.getName))
      .foreach(s => fs.delete(s.getPath, false))
  }

  /** Index bootstrap at WRITER CONSTRUCTION: the directory plus the
    * reference's index-template request body
    * ([[AssetSink.indexTemplateJson]], `es_client.ts:48`) — installed
    * once, before any document lands.
    */
  def bootstrapIndex(path: String, conf: Configuration): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) { fs.mkdirs(dir); () }
    val tpl = new Path(dir, EsShapedSink.TemplateFile)
    if (!fs.exists(tpl)) {
      val out = fs.create(tpl, false)
      try out.write(AssetSink.indexTemplateJson
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Inverse of [[sparkSchema]]: the parquet MessageType the writer
    * emits (all-optional fields; timestamps as INT64 MICROS per
    * `isAdjustedToUTC`; lists in the standard 3-level shape the reader
    * and Spark's own source both understand).
    */
  def parquetSchema(schema: StructType,
      name: String = "es_shaped"): MessageType = {
    import org.apache.parquet.schema.Types
    def prim(dt: DataType)
        : org.apache.parquet.schema.Types.PrimitiveBuilder[org.apache.parquet.schema.PrimitiveType] =
      dt match {
        case LongType => Types.optional(INT64)
        case IntegerType => Types.optional(INT32)
        case DoubleType => Types.optional(DOUBLE)
        case FloatType => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType => Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case TimestampType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS))
        case TimestampNTZType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS))
        case other => throw new UnsupportedOperationException(
          s"es-shaped write: unsupported type $other")
      }
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case ArrayType(et, _) =>
          b.addField(Types.optionalList()
            .element(prim(et).named("element"))
            .named(f.name))
        case dt => b.addField(prim(dt).named(f.name))
      }
    }
    b.named(name)
  }

  /** DataFrameReader.load(paths) hands a V2 provider either a single
    * `path` or a JSON-encoded `paths` array.
    */
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    Option(options.get("paths")).map { js =>
      JsonMethods.parse(js) match {
        case JArray(vs) => vs.collect { case JString(s) => s }
        case _ => Nil
      }
    }.getOrElse(Nil) ++ Option(options.get("path")).toSeq
  }

  /** Multiplier normalizing an INT64 timestamp column's raw value into
    * the MICROS domain InternalRow and every pushed-predicate constant
    * live in: 1000 for MILLIS, 1 for everything else (MICROS is
    * native; NANOS maps to a raw LongType so its longs pass through).
    */
  def microsScale(t: org.apache.parquet.schema.Type): Long =
    if (!t.isPrimitive) 1L
    else t.asPrimitiveType().getLogicalTypeAnnotation match {
      case ts: TimestampLogicalTypeAnnotation
          if ts.getUnit == TimeUnit.MILLIS => 1000L
      case _ => 1L
    }

  private def primitiveSparkType(name: String,
      p: org.apache.parquet.schema.PrimitiveType): DataType =
    (p.getPrimitiveTypeName, p.getLogicalTypeAnnotation) match {
      case (INT64, ts: TimestampLogicalTypeAnnotation) =>
        ts.getUnit match {
          case TimeUnit.NANOS => LongType // the nanosAsLong convention
          case TimeUnit.MICROS | TimeUnit.MILLIS =>
            if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
        }
      case (INT64, _) => LongType
      case (INT32, _) => IntegerType
      case (DOUBLE, _) => DoubleType
      case (FLOAT, _) => FloatType
      case (BOOLEAN, _) => BooleanType
      case (BINARY, _: StringLogicalTypeAnnotation) => StringType
      case (pt, lt) => throw new UnsupportedOperationException(
        s"es-shaped: unsupported column $name: $pt/$lt")
    }

  /** The parquet LIST element type of a 3-level list group
    * (`group (LIST) { repeated group list { <element> } }` — the shape
    * Spark writes), or None when the group is not that shape.
    */
  def listElement(g: org.apache.parquet.schema.GroupType)
      : Option[org.apache.parquet.schema.PrimitiveType] =
    g.getLogicalTypeAnnotation match {
      case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation
          if g.getFieldCount == 1 && !g.getType(0).isPrimitive &&
            g.getType(0).asGroupType().getFieldCount == 1 &&
            g.getType(0).asGroupType().getType(0).isPrimitive =>
        Some(g.getType(0).asGroupType().getType(0).asPrimitiveType())
      case _ => None
    }

  def sparkSchema(m: MessageType): StructType = StructType(
    m.getFields.asScala.toSeq.map { t =>
      require(!t.isRepetition(org.apache.parquet.schema
          .Type.Repetition.REPEATED),
        s"es-shaped: repeated column '${t.getName}' is outside the " +
          "connector's wire surface")
      val dt =
        if (t.isPrimitive) primitiveSparkType(t.getName, t.asPrimitiveType())
        else listElement(t.asGroupType()) match {
          // ES `fields` responses are ARRAYS by definition (SURVEY
          // §1.3 P3) and the asset docs carry array<string> edge
          // lists — lists of primitives are first-class wire surface.
          // Timestamp elements stay out (no micros normalization for
          // nested values): fail fast rather than emit wrong units.
          case Some(e) =>
            e.getLogicalTypeAnnotation match {
              case _: TimestampLogicalTypeAnnotation =>
                throw new UnsupportedOperationException(
                  s"es-shaped: timestamp list elements unsupported: ${t.getName}")
              case _ => ()
            }
            ArrayType(primitiveSparkType(t.getName, e), containsNull = true)
          case None => throw new UnsupportedOperationException(
            s"es-shaped: nested column '${t.getName}' is outside the " +
              "connector's wire surface (primitives and lists of " +
              "primitives only)")
        }
      StructField(t.getName, dt, nullable = true)
    })

  /** Materialize a 3-level parquet LIST group instance as the catalyst
    * ArrayData the InternalRow carries (null elements preserved).
    */
  def arrayValue(listGroup: org.apache.parquet.example.data.Group,
      listType: org.apache.parquet.schema.GroupType)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val elemType = listType.getType(0).asGroupType().getType(0)
      .asPrimitiveType().getPrimitiveTypeName
    val n = listGroup.getFieldRepetitionCount(0)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val wrapper = listGroup.getGroup(0, i)
      out(i) =
        if (wrapper.getFieldRepetitionCount(0) == 0) null
        else elemType match {
          case INT64 => wrapper.getLong(0, 0)
          case INT32 => wrapper.getInteger(0, 0)
          case DOUBLE => wrapper.getDouble(0, 0)
          case FLOAT => wrapper.getFloat(0, 0)
          case BOOLEAN => wrapper.getBoolean(0, 0)
          case BINARY =>
            UTF8String.fromString(wrapper.getBinary(0, 0).toStringUsingUTF8)
          case other => throw new UnsupportedOperationException(
            s"es-shaped: unsupported list element type $other")
        }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Serializable pushed predicate over the connector's raw comparison
    * domain (Long for integers+timestamp micros, Double, String,
    * Boolean) — V1 Filter values are converted ONCE at plan time.
    */
  final case class Pred(col: String, op: String, values: Seq[Any])
      extends Serializable {

    private def cmp(l: Any, r: Any): Int = (l, r) match {
      case (a: Long, b: Long) => java.lang.Long.compare(a, b)
      case (a: Double, b: Double) => java.lang.Double.compare(a, b)
      case (a: String, b: String) => a.compareTo(b)
      case (a: Boolean, b: Boolean) => java.lang.Boolean.compare(a, b)
      case _ => throw new IllegalStateException(s"es-shaped cmp $l vs $r")
    }

    /** Evaluate against a RAW reader value (null-rejecting like SQL
      * comparison semantics except the null tests).
      */
    def eval(raw: Any): Boolean = {
      val v = normalize(raw)
      op match {
        case "isnull" => v == null
        case "notnull" => v != null
        case _ if v == null => false
        case "eq" => cmp(v, values.head) == 0
        case "gt" => cmp(v, values.head) > 0
        case "ge" => cmp(v, values.head) >= 0
        case "lt" => cmp(v, values.head) < 0
        case "le" => cmp(v, values.head) <= 0
        case "in" => values.exists(cmp(v, _) == 0)
        case "startswith" =>
          v.asInstanceOf[String].startsWith(values.head.asInstanceOf[String])
      }
    }

    /** Row-group survives unless the column stats PROVE no row can
      * match (stats missing/foreign type → conservatively keep).
      * `nulls == -1` means the footer did not record a null count.
      */
    def survives(min: Any, max: Any, nulls: Long, rows: Long): Boolean = {
      val lo = normalize(min)
      val hi = normalize(max)
      op match {
        case "isnull" => nulls == -1L || nulls > 0
        case "notnull" => nulls == -1L || nulls < rows
        case _ if lo == null || hi == null => true
        case "eq" => cmp(lo, values.head) <= 0 && cmp(hi, values.head) >= 0
        case "gt" => cmp(hi, values.head) > 0
        case "ge" => cmp(hi, values.head) >= 0
        case "lt" => cmp(lo, values.head) < 0
        case "le" => cmp(lo, values.head) <= 0
        case "in" =>
          values.exists(v => cmp(lo, v) <= 0 && cmp(hi, v) >= 0)
        case "startswith" =>
          val p = values.head.asInstanceOf[String]
          lo.asInstanceOf[String].take(p.length) <= p &&
            hi.asInstanceOf[String].take(p.length) >= p
      }
    }

    private def normalize(raw: Any): Any = raw match {
      case null => null
      case i: Int => i.toLong
      case i: Integer => i.longValue()
      case f: Float => f.toDouble
      case f: java.lang.Float => f.doubleValue()
      case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
      case other => other
    }
  }

  private def toMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
    case l: java.time.LocalDateTime =>
      Some(l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        l.getNano / 1000)
    case _ => None
  }

  /** Convert a V1 filter value into the column's raw comparison domain;
    * None = the filter is not pushable for this column.
    */
  private def conv(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (LongType | IntegerType, n: Number) => Some(n.longValue())
    case (DoubleType | FloatType, n: Number) => Some(n.doubleValue())
    case (StringType, s: String) => Some(s)
    case (BooleanType, b: java.lang.Boolean) => Some(b.booleanValue())
    case (TimestampType | TimestampNTZType, t) => toMicros(t)
    case _ => None
  }

  def toPred(f: Filter, schema: StructType): Option[Pred] = {
    def dt(col: String): Option[DataType] =
      schema.fields.find(_.name == col).map(_.dataType)
    def one(col: String, op: String, v: Any): Option[Pred] =
      dt(col).flatMap(conv(_, v)).map(c => Pred(col, op, Seq(c)))
    f match {
      case EqualTo(c, v) => one(c, "eq", v)
      case GreaterThan(c, v) => one(c, "gt", v)
      case GreaterThanOrEqual(c, v) => one(c, "ge", v)
      case LessThan(c, v) => one(c, "lt", v)
      case LessThanOrEqual(c, v) => one(c, "le", v)
      case In(c, vs) if vs.nonEmpty =>
        dt(c).flatMap { t =>
          val cs = vs.toSeq.map(conv(t, _))
          if (cs.forall(_.isDefined)) Some(Pred(c, "in", cs.flatten))
          else None
        }
      case IsNull(c) if dt(c).isDefined => Some(Pred(c, "isnull", Nil))
      case IsNotNull(c) if dt(c).isDefined => Some(Pred(c, "notnull", Nil))
      case StringStartsWith(c, p) if dt(c).contains(StringType) =>
        Some(Pred(c, "startswith", Seq(p)))
      // And never arrives top-level (Catalyst splits conjuncts before
      // pushdown); Or/Not and nested shapes stay Spark-side
      case _ => None
    }
  }

  def blockSurvives(b: org.apache.parquet.hadoop.metadata.BlockMetaData,
      preds: Seq[Pred], schema: StructType): Boolean = {
    if (preds.isEmpty) return true
    val byCol = b.getColumns.asScala
      .map(c => c.getPath.toDotString -> c).toMap
    preds.forall { p =>
      byCol.get(p.col) match {
        case Some(c) =>
          val s = c.getStatistics
          if (s == null || s.isEmpty) true
          else {
            // MILLIS stats live in the millis domain; predicate
            // constants are micros — normalize before comparing
            val scale = microsScale(c.getPrimitiveType)
            def adj(v: Any): Any = v match {
              case l: java.lang.Long if scale != 1L => l.longValue() * scale
              case other => other
            }
            val (mn, mx) =
              if (s.hasNonNullValue)
                (adj(s.genericGetMin), adj(s.genericGetMax))
              else (null, null)
            p.survives(mn, mx, if (s.isNumNullsSet) s.getNumNulls else -1L,
              b.getRowCount)
          }
        case None => true
      }
    }
  }
}
