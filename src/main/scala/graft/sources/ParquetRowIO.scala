package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.api.{InitContext, ReadSupport, WriteSupport}
import org.apache.parquet.hadoop.api.ReadSupport.ReadContext
import org.apache.parquet.hadoop.api.WriteSupport.WriteContext
import org.apache.parquet.hadoop.{ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api._
import org.apache.parquet.schema._
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit => PTimeUnit}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** InternalRow ⇄ parquet for flat schemas, written against the public
  * parquet-mr API (no Spark-internal reader/writer classes). This powers
  * the graft DSv2 source's scan and write paths — the capability analog of
  * the reference's direct HFile reader/writer
  * (`HBaseFileFormat.scala:70-248`), with Parquet as the at-rest format.
  *
  * Supported field types: boolean, byte, short, int, long, float, double,
  * string, binary, date, timestamp, timestamp_ntz.
  */
object ParquetRowIO {

  /** UDT columns store as their sqlType (the reference does the same:
    * RegionInfoUDT has BinaryType sqlType, SURVEY.md §1.4). */
  private def physical(dt: DataType): DataType = dt match {
    case udt: UserDefinedType[_] => physical(udt.sqlType)
    case other => other
  }

  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val rep = if (f.nullable) Type.Repetition.OPTIONAL else Type.Repetition.REQUIRED
      val t = physical(f.dataType) match {
        case BooleanType => Types.primitive(BOOLEAN, rep)
        case ByteType =>
          Types.primitive(INT32, rep).as(LogicalTypeAnnotation.intType(8, true))
        case ShortType =>
          Types.primitive(INT32, rep).as(LogicalTypeAnnotation.intType(16, true))
        case IntegerType => Types.primitive(INT32, rep)
        case LongType => Types.primitive(INT64, rep)
        case FloatType => Types.primitive(FLOAT, rep)
        case DoubleType => Types.primitive(DOUBLE, rep)
        case StringType =>
          Types.primitive(BINARY, rep).as(LogicalTypeAnnotation.stringType())
        case BinaryType => Types.primitive(BINARY, rep)
        case DateType =>
          Types.primitive(INT32, rep).as(LogicalTypeAnnotation.dateType())
        case TimestampType =>
          Types.primitive(INT64, rep)
            .as(LogicalTypeAnnotation.timestampType(true, PTimeUnit.MICROS))
        case TimestampNTZType =>
          Types.primitive(INT64, rep)
            .as(LogicalTypeAnnotation.timestampType(false, PTimeUnit.MICROS))
        case other =>
          throw new IllegalArgumentException(s"graft source: unsupported type $other")
      }
      b.addField(t.named(f.name))
    }
    b.named("graft_row")
  }

  // ---- write -------------------------------------------------------------

  final class RowWriteSupport(schema: StructType) extends WriteSupport[InternalRow] {
    private var consumer: RecordConsumer = _

    override def init(conf: Configuration): WriteContext =
      new WriteContext(messageType(schema),
        Map("graft.schema" -> schema.json).asJava)

    override def prepareForWrite(rc: RecordConsumer): Unit = consumer = rc

    override def write(row: InternalRow): Unit = {
      consumer.startMessage()
      var i = 0
      while (i < schema.length) {
        if (!row.isNullAt(i)) {
          val f = schema(i)
          consumer.startField(f.name, i)
          physical(f.dataType) match {
            case BooleanType => consumer.addBoolean(row.getBoolean(i))
            case ByteType => consumer.addInteger(row.getByte(i).toInt)
            case ShortType => consumer.addInteger(row.getShort(i).toInt)
            case IntegerType | DateType => consumer.addInteger(row.getInt(i))
            case LongType | TimestampType | TimestampNTZType =>
              consumer.addLong(row.getLong(i))
            case FloatType => consumer.addFloat(row.getFloat(i))
            case DoubleType => consumer.addDouble(row.getDouble(i))
            case StringType =>
              consumer.addBinary(Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
            case BinaryType =>
              consumer.addBinary(Binary.fromConstantByteArray(row.getBinary(i)))
            case other => throw new IllegalArgumentException(s"unsupported $other")
          }
          consumer.endField(f.name, i)
        }
        i += 1
      }
      consumer.endMessage()
    }
  }

  final class WriterBuilder(path: Path, schema: StructType)
      extends ParquetWriter.Builder[InternalRow, WriterBuilder](path) {
    override def self(): WriterBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new RowWriteSupport(schema)
  }

  /** Table properties controlling the physical parquet layout — the
    * capability analog of the reference's per-table `encoding/split/bloom/
    * zip` storage knobs (`HBaseClientImpl.scala:303-365`), re-expressed as
    * the knobs that matter for parquet at scale. */
  object WriteProps {
    val Compression = "write.compression" // snappy|gzip|zstd|lz4|uncompressed
    val RowGroupBytes = "write.rowgroup.bytes" // long, default 128 MiB
    val PageBytes = "write.page.bytes" // int, default 1 MiB
    val Dictionary = "write.dictionary" // true|false
    /** Comma-separated column names that get a per-row-group BLOOM FILTER.
      * For high-cardinality point lookups (ids, hashes, urls) where
      * [min, max] ranges overlap across every file and can prune nothing:
      * an equality predicate against an absent value skips the whole row
      * group from the footer alone. The reference exposed HBase's
      * per-family bloom knob (`HBaseClientImpl.scala:303-365`); this is
      * the parquet-native equivalent. */
    val BloomColumns = "write.bloom.columns"
    val BloomNdv = "write.bloom.ndv" // expected distinct values per group
  }

  def newWriter(
      path: Path,
      schema: StructType,
      conf: Configuration,
      props: Map[String, String] = Map.empty): ParquetWriter[InternalRow] = {
    val codec = props.get(WriteProps.Compression)
      .map(c => CompressionCodecName.valueOf(c.toUpperCase(java.util.Locale.ROOT)))
      .getOrElse(CompressionCodecName.SNAPPY)
    var b = new WriterBuilder(path, schema)
      .withConf(conf)
      .withCompressionCodec(codec)
    props.get(WriteProps.RowGroupBytes).foreach(v => b = b.withRowGroupSize(v.toLong))
    props.get(WriteProps.PageBytes).foreach(v => b = b.withPageSize(v.toInt))
    props.get(WriteProps.Dictionary).foreach(v => b = b.withDictionaryEncoding(v.toBoolean))
    props.get(WriteProps.BloomColumns).foreach(
      _.split(',').map(_.trim).filter(_.nonEmpty).foreach { c =>
        b = b.withBloomFilterEnabled(c, true)
        props.get(WriteProps.BloomNdv).foreach(n => b = b.withBloomFilterNDV(c, n.toLong))
      })
    b.build()
  }

  // ---- read --------------------------------------------------------------

  private final class FieldConverter(dt: DataType, idx: Int, values: Array[Any])
      extends PrimitiveConverter {
    override def addBoolean(v: Boolean): Unit = values(idx) = v
    // The requested type may be WIDER than the file's physical type
    // (ALTER COLUMN ... TYPE widening: old files keep their narrow
    // encoding, the converter upcasts per value) — the long/double arms
    // below are what make metadata-only type evolution readable.
    override def addInt(v: Int): Unit = values(idx) = dt match {
      case ByteType => v.toByte
      case ShortType => v.toShort
      case LongType => v.toLong
      case DoubleType => v.toDouble
      case _ => v
    }
    override def addLong(v: Long): Unit = values(idx) = v
    override def addFloat(v: Float): Unit = values(idx) = dt match {
      case DoubleType => v.toDouble
      case _ => v
    }
    override def addDouble(v: Double): Unit = values(idx) = v
    override def addBinary(v: Binary): Unit = values(idx) = dt match {
      case StringType => UTF8String.fromBytes(v.getBytes)
      case _ => v.getBytes
    }
  }

  /** Materializes rows of `schema`; only `presentFields` (a subset, in
    * requested-message order) exist in this file — the rest read their
    * `prefill` slot: null for plain schema evolution, the column's
    * EXISTS_DEFAULT for `ADD COLUMN ... DEFAULT v` (metadata-only
    * backfill of files written before the column existed). */
  private final class RowMaterializer(
      schema: StructType, presentFields: Seq[String], prefill: Array[Any])
      extends RecordMaterializer[InternalRow] {
    private val values = new Array[Any](schema.length)
    private val root: GroupConverter = new GroupConverter {
      private val converters = presentFields.map { name =>
        val i = schema.fieldIndex(name)
        new FieldConverter(physical(schema(i).dataType), i, values)
      }.toArray
      override def getConverter(i: Int): Converter = converters(i)
      override def start(): Unit =
        System.arraycopy(prefill, 0, values, 0, prefill.length)
      override def end(): Unit = ()
    }
    override def getCurrentRecord: InternalRow = new GenericInternalRow(values.clone())
    override def getRootConverter: GroupConverter = root
  }

  /** The value rows in files WITHOUT this column read back: the folded
    * `EXISTS_DEFAULT` literal recorded at `ADD COLUMN ... DEFAULT v` time
    * (null when the column has no existence default). Evaluated once per
    * file, in Catalyst-internal form. */
  private def existenceDefault(f: org.apache.spark.sql.types.StructField): Any =
    if (!f.metadata.contains("EXISTS_DEFAULT")) null
    else {
      val sql = f.metadata.getString("EXISTS_DEFAULT")
      val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(sql)
      val cast = org.apache.spark.sql.catalyst.expressions.Cast(
        parsed, f.dataType, Some("UTC"))
      require(cast.foldable,
        s"graft: EXISTS_DEFAULT of ${f.name} is not a literal: $sql")
      cast.eval(null)
    }

  /** @param renames current column name → its FORMER names, newest first
    *   (ALTER TABLE RENAME COLUMN history). A file written before a rename
    *   carries the old physical name; `init` resolves, PER FILE, each
    *   requested column to whichever of its names the file actually has —
    *   a metadata-only rename, no data rewritten. */
  final class RowReadSupport(
      requiredSchema: StructType,
      renames: Map[String, Seq[String]] = Map.empty) extends ReadSupport[InternalRow] {
    // file-schema name -> requested-schema name, resolved per file
    private var targetOf: Map[String, String] = Map.empty
    override def init(context: InitContext): ReadContext = {
      // request only the columns this file actually has (under current OR
      // former names); missing ones are filled with null by the
      // materializer (schema evolution)
      val fileTypes = context.getFileSchema.getFields.asScala
        .map(t => t.getName -> t).toMap
      val fileFields = fileTypes.keySet
      val resolved: Seq[(org.apache.spark.sql.types.StructField, String)] =
        requiredSchema.fields.toSeq.flatMap { f =>
          if (fileFields.contains(f.name)) Some(f -> f.name)
          else renames.getOrElse(f.name, Nil).find(fileFields.contains).map(f -> _)
        }
      targetOf = resolved.map { case (f, inFile) => inFile -> f.name }.toMap
      // ALTER COLUMN ... TYPE widening: a file written before the change
      // keeps its narrow physical type. The projection must request what
      // the FILE stores (parquet-mr rejects primitive mismatches), so
      // narrow the requested field per file; [[FieldConverter]] upcasts
      // each value to the requested type.
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
      def narrowed(f: org.apache.spark.sql.types.StructField, inFile: String) = {
        val ft = fileTypes(inFile)
        if (!ft.isPrimitive) f
        else (physical(f.dataType), ft.asPrimitiveType().getPrimitiveTypeName) match {
          case (LongType, PrimitiveTypeName.INT32)
              if ft.getLogicalTypeAnnotation == null =>
            f.copy(dataType = IntegerType)
          case (DoubleType, PrimitiveTypeName.INT32)
              if ft.getLogicalTypeAnnotation == null =>
            f.copy(dataType = IntegerType)
          case (DoubleType, PrimitiveTypeName.FLOAT) => f.copy(dataType = FloatType)
          case _ => f
        }
      }
      new ReadContext(messageType(
        StructType(resolved.map { case (f, inFile) =>
          narrowed(f, inFile).copy(name = inFile) })))
    }
    override def prepareForRead(
        conf: Configuration,
        keyValueMetaData: java.util.Map[String, String],
        fileSchema: MessageType,
        readContext: ReadContext): RecordMaterializer[InternalRow] = {
      val present = readContext.getRequestedSchema.getFields.asScala
        .map(f => targetOf(f.getName)).toSeq
      val presentSet = present.toSet
      val prefill = requiredSchema.fields.map(f =>
        if (presentSet.contains(f.name)) null else existenceDefault(f))
      new RowMaterializer(requiredSchema, present, prefill)
    }
  }

  def newReader(
      path: Path,
      requiredSchema: StructType,
      conf: Configuration,
      filter: Option[org.apache.parquet.filter2.compat.FilterCompat.Filter],
      range: Option[(Long, Long)] = None,
      renames: Map[String, Seq[String]] = Map.empty)
      : ParquetReader[InternalRow] = {
    val b0 = ParquetReader.builder(new RowReadSupport(requiredSchema, renames), path).withConf(conf)
    val b1 = filter.fold(b0)(b0.withFilter)
    // byte-range split: only row groups whose midpoint falls in
    // [start, end) are read — the standard split-assignment rule
    val b2 = range.fold(b1) { case (s0, e0) => b1.withFileRange(s0, e0) }
    b2.build()
  }
}
