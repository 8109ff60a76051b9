package graft.sources

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Partition-field spec for graft tables: identity columns (hive-style
  * `col=value` directories) or HASH BUCKETS (`bucket(n, col)` — directories
  * `col.bucket=<id>`). Buckets co-locate a high-cardinality key into a
  * fixed number of directories: equal keys always land in the same bucket,
  * so point lookups scan 1/n of the table and co-bucketed tables can join
  * bucket-to-bucket — without one directory per key value.
  *
  * Specs serialize into `_meta.yml`'s `partitions` list as plain strings:
  * `"col"` or `"bucket(n,col)"` (the reference stores no partition metadata
  * at all — its partition APIs throw).
  */
object PartField {

  sealed trait Field {
    def col: String
    /** Directory-name key (`<dir>=<value>` on disk). */
    def dir: String
    def spec: String
  }
  final case class Identity(col: String) extends Field {
    def dir: String = col
    def spec: String = col
  }
  final case class Bucket(n: Int, col: String) extends Field {
    require(n > 0, s"bucket count must be positive, got $n")
    def dir: String = s"$col.bucket"
    def spec: String = s"bucket($n,$col)"
  }
  /** Time-based HIDDEN partitioning (`PARTITIONED BY (days(ts))`): rows
    * route into one directory per calendar day of a date/timestamp
    * column — the 100 TB ingest layout — and range/equality filters on
    * the SOURCE column prune day directories without the query ever
    * naming the partition (Iceberg-style hidden partitioning; Hive would
    * force a redundant `WHERE dt = ...`). */
  final case class Days(col: String) extends Field {
    def dir: String = s"$col.day"
    def spec: String = s"days($col)"
  }

  private val B = """bucket\((\d+),(.+)\)""".r
  private val D = """days\((.+)\)""".r

  def parse(s: String): Field = s match {
    case B(n, c) => Bucket(n.toInt, c.trim)
    case D(c) => Days(c.trim)
    case c => Identity(c)
  }

  /** Connector `Transform` → Field — the one parser for partitioning
    * handed to the catalog (CREATE TABLE) or the path-based provider. */
  def fromTransform(
      t: org.apache.spark.sql.connector.expressions.Transform): Field = t match {
    case t if t.name() == "identity" && t.references().length == 1 =>
      Identity(t.references()(0).fieldNames().mkString("."))
    case t if t.name() == "bucket" && t.references().length == 1 =>
      val n = t.arguments().collectFirst {
        case lit: org.apache.spark.sql.connector.expressions.Literal[_]
            if lit.value().isInstanceOf[Number] =>
          lit.value().asInstanceOf[Number].intValue()
      }.getOrElse(throw new IllegalArgumentException(
        s"graft: bucket transform without a count: $t"))
      Bucket(n, t.references()(0).fieldNames().mkString("."))
    case t if t.name() == "days" && t.references().length == 1 =>
      Days(t.references()(0).fieldNames().mkString("."))
    case other => throw new UnsupportedOperationException(
      s"graft: unsupported partition transform $other " +
        "(identity, bucket(n, col), and days(col) only)")
  }

  /** Field → connector `Transform` (inverse of [[fromTransform]]). */
  def toTransform(f: Field): org.apache.spark.sql.connector.expressions.Transform = {
    import org.apache.spark.sql.connector.expressions.Expressions
    f match {
      case Identity(c) => Expressions.identity(c)
      case Bucket(n, c) => Expressions.bucket(n, c)
      case Days(c) => Expressions.days(c)
    }
  }

  /** Column types `days(col)` supports. */
  def supportsDayType(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Epoch day of a CATALYST value (Int days for dates, Long micros for
    * timestamps) or an EXTERNAL filter value — both normalize to the
    * same day, so pushed filters prune exactly the directories the
    * writer chose. Null stays null (its own directory). */
  def dayOf(dt: DataType, value: Any): java.lang.Long = {
    if (value == null) return null
    dt match {
      case DateType => value match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay
        case d: java.time.LocalDate => d.toEpochDay
        case x: Number => x.longValue()
      }
      case TimestampType | TimestampNTZType =>
        val micros: Long = value match {
          case t: java.sql.Timestamp =>
            Math.addExact(Math.multiplyExact(t.toInstant.getEpochSecond, 1000000L),
              (t.getNanos / 1000).toLong)
          case i: java.time.Instant =>
            Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
              (i.getNano / 1000).toLong)
          case l: java.time.LocalDateTime =>
            val i = l.toInstant(java.time.ZoneOffset.UTC)
            Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
              (i.getNano / 1000).toLong)
          case x: Number => x.longValue()
        }
        Math.floorDiv(micros, 86400000000L)
      case other =>
        throw new IllegalArgumentException(s"graft: days over $other not supported")
    }
  }

  /** Directory rendering of an epoch day: the ISO date (human-scannable
    * layout, `ts.day=2026-08-12`); null partitions use the shared null
    * token. */
  def renderDay(day: java.lang.Long): String =
    if (day == null) PartitionPruning.NullToken
    else java.time.LocalDate.ofEpochDay(day).toString

  def parseDay(raw: String): java.lang.Long =
    if (raw == PartitionPruning.NullToken) null
    else java.time.LocalDate.parse(raw).toEpochDay

  /** Can a row whose `field.col` falls on `day` (null = the null
    * directory) satisfy filter `f`? Conservative Kleene collapse: only
    * provable exclusions return false, unknown shapes (Not, unrelated
    * columns) keep the directory. Top-level filters are conjunctive —
    * the caller requires every filter to allow the day. */
  def dayMayMatch(
      f: org.apache.spark.sql.sources.Filter,
      field: Days,
      dt: DataType,
      day: java.lang.Long): Boolean = {
    import org.apache.spark.sql.sources._
    def d(v: Any): java.lang.Long = dayOf(dt, v)
    f match {
      case EqualTo(a, v) if a == field.col =>
        v != null && day != null && d(v) == day
      case EqualNullSafe(a, v) if a == field.col =>
        if (v == null) day == null else day != null && d(v) == day
      case In(a, vs) if a == field.col && vs.nonEmpty =>
        day != null && vs.exists(v => v != null && d(v) == day)
      case GreaterThan(a, v) if a == field.col && v != null =>
        day != null && day >= d(v)
      case GreaterThanOrEqual(a, v) if a == field.col && v != null =>
        day != null && day >= d(v)
      case LessThan(a, v) if a == field.col && v != null =>
        day != null && day <= d(v)
      case LessThanOrEqual(a, v) if a == field.col && v != null =>
        day != null && day <= d(v)
      case IsNull(a) if a == field.col => day == null
      case IsNotNull(a) if a == field.col => day != null
      case And(l, r) =>
        dayMayMatch(l, field, dt, day) && dayMayMatch(r, field, dt, day)
      case Or(l, r) =>
        dayMayMatch(l, field, dt, day) || dayMayMatch(r, field, dt, day)
      case _ => true
    }
  }

  /** Column types the bucket hash supports. */
  def supportsBucketType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
        DateType => true
    case _ => false
  }

  private val Seed = 42

  /** Stable bucket assignment (murmur3 of the normalized value) shared by
    * the write path, scan-side bucket pruning, and both sides of a
    * co-bucketed join. Accepts Catalyst values (Int days, UTF8String) AND
    * external filter values (java.sql.Date, String) — both normalize to
    * the same hash input, so a pushed `EqualTo` prunes to the exact
    * bucket the writer chose. */
  def bucketOf(dt: DataType, value: Any, n: Int): Int = {
    if (value == null) return 0
    val h = dt match {
      case DateType =>
        val days = value match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
          case x: Number => x.longValue()
        }
        Murmur3_x86_32.hashLong(days, Seed)
      case ByteType | ShortType | IntegerType | LongType =>
        Murmur3_x86_32.hashLong(value.asInstanceOf[Number].longValue(), Seed)
      case StringType =>
        val u = value match {
          case u8: UTF8String => u8
          case s => UTF8String.fromString(String.valueOf(s))
        }
        Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), Seed)
      case other =>
        throw new IllegalArgumentException(s"graft: bucket over $other not supported")
    }
    java.lang.Math.floorMod(h, n)
  }

  /** Bucket ids a pushed filter allows for `field`, None = all. Only
    * equality shapes constrain a hash bucket (ranges spread across all
    * buckets by construction). Top-level filters are conjunctive, so the
    * caller intersects the defined sets. */
  def allowedBuckets(
      f: org.apache.spark.sql.sources.Filter,
      field: Bucket,
      dt: DataType): Option[Set[Int]] = {
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) if a == field.col && v != null =>
        Some(Set(bucketOf(dt, v, field.n)))
      case EqualNullSafe(a, v) if a == field.col =>
        Some(Set(bucketOf(dt, v, field.n)))
      case In(a, vs) if a == field.col && vs.nonEmpty =>
        Some(vs.map(v => bucketOf(dt, v, field.n)).toSet)
      case IsNull(a) if a == field.col => Some(Set(bucketOf(dt, null, field.n)))
      case And(l, r) =>
        (allowedBuckets(l, field, dt), allowedBuckets(r, field, dt)) match {
          case (Some(a), Some(b)) => Some(a intersect b)
          case (a, b) => a.orElse(b)
        }
      case Or(l, r) =>
        for {
          a <- allowedBuckets(l, field, dt)
          b <- allowedBuckets(r, field, dt)
        } yield a union b
      case _ => None
    }
  }
}

/** The `bucket` function served by [[GraftCatalog]]'s `FunctionCatalog`
  * surface: Spark resolves a scan's `bucket(n, col)` transform against it
  * when planning storage-partitioned joins, so two graft tables bucketed
  * the same way join bucket-to-bucket with no shuffle. `canonicalName`
  * ties compatibility to the input type — same type + same n = same
  * partitioning. */
object GraftBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): graft murmur3 hash bucket id in [0, n)"
  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, value), got $inputType")
    val dt = inputType.fields(1).dataType
    require(PartField.supportsBucketType(dt), s"bucket over $dt not supported")
    new org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = s"graft.bucket(${dt.simpleString})"
      override def isResultNullable: Boolean = false
      override def produceResult(
          input: org.apache.spark.sql.catalyst.InternalRow): Integer = {
        val v = if (input.isNullAt(1)) null else input.get(1, dt)
        PartField.bucketOf(dt, v, input.getInt(0))
      }
    }
  }
}
