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
  /** Time-based HIDDEN partitioning (`PARTITIONED BY (days(ts))`, also
    * `months(ts)` / `hours(ts)`): rows route into one directory per time
    * unit of a date/timestamp column — the 100 TB ingest layout — and
    * range/equality filters on the SOURCE column prune unit directories
    * without the query ever naming the partition (Iceberg-style hidden
    * partitioning; Hive would force a redundant `WHERE dt = ...`).
    * The shared contract: [[TimeUnitField.floorOf]] maps a value to its
    * unit ordinal (monotonic in the value — what makes range pruning
    * sound), [[TimeUnitField.render]]/[[TimeUnitField.parseRaw]]
    * round-trip the directory token. */
  sealed trait TimeUnitField extends Field {
    /** Unit ordinal of a Catalyst OR external value (null stays null). */
    def floorOf(dt: DataType, value: Any): java.lang.Long
    /** Human-scannable directory token for a unit ordinal. */
    def render(unit: java.lang.Long): String
    def parseRaw(raw: String): java.lang.Long
  }
  final case class Days(col: String) extends TimeUnitField {
    def dir: String = s"$col.day"
    def spec: String = s"days($col)"
    def floorOf(dt: DataType, value: Any): java.lang.Long = dayOf(dt, value)
    def render(unit: java.lang.Long): String =
      if (unit == null) PartitionPruning.NullToken
      else java.time.LocalDate.ofEpochDay(unit).toString
    def parseRaw(raw: String): java.lang.Long =
      if (raw == PartitionPruning.NullToken) null
      else java.time.LocalDate.parse(raw).toEpochDay
  }
  final case class Months(col: String) extends TimeUnitField {
    def dir: String = s"$col.month"
    def spec: String = s"months($col)"
    def floorOf(dt: DataType, value: Any): java.lang.Long = {
      val day = dayOf(dt, value)
      if (day == null) null
      else {
        val d = java.time.LocalDate.ofEpochDay(day)
        d.getYear.toLong * 12 + (d.getMonthValue - 1)
      }
    }
    def render(unit: java.lang.Long): String =
      if (unit == null) PartitionPruning.NullToken
      // floorDiv/floorMod (not truncating / and %): negative ordinals
      // (proleptic years <= 0) must keep the month in [1, 12] and the
      // sign on the year, or the token can't be parsed back
      else f"${Math.floorDiv(unit, 12L)}%04d-${Math.floorMod(unit, 12L) + 1}%02d"
    def parseRaw(raw: String): java.lang.Long =
      if (raw == PartitionPruning.NullToken) null
      else {
        // split at the LAST '-' so a negative year's sign survives
        val i = raw.lastIndexOf('-')
        raw.substring(0, i).toLong * 12 + (raw.substring(i + 1).toLong - 1)
      }
  }
  final case class Hours(col: String) extends TimeUnitField {
    def dir: String = s"$col.hour"
    def spec: String = s"hours($col)"
    def floorOf(dt: DataType, value: Any): java.lang.Long = dt match {
      case DateType =>
        val day = dayOf(dt, value)
        if (day == null) null else day * 24L
      case _ =>
        val day = dayOf(dt, value) // validates the type
        if (day == null) null
        else {
          // recompute at hour precision from the same micros
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
          Math.floorDiv(micros, 3600000000L)
        }
    }
    def render(unit: java.lang.Long): String =
      if (unit == null) PartitionPruning.NullToken
      else {
        val day = java.time.LocalDate.ofEpochDay(Math.floorDiv(unit, 24L))
        f"$day-${Math.floorMod(unit, 24L)}%02d"
      }
    def parseRaw(raw: String): java.lang.Long =
      if (raw == PartitionPruning.NullToken) null
      else {
        val (d, h) = raw.splitAt(raw.lastIndexOf('-'))
        java.time.LocalDate.parse(d).toEpochDay * 24L + h.drop(1).toLong
      }
  }

  /** Width-based HIDDEN partitioning (`PARTITIONED BY (truncate(w, col))`,
    * Iceberg-style): integral values floor to multiples of `w`, strings
    * keep their first `w` characters — one directory per truncated value.
    * Both truncations are MONOTONE in the column value (floor-to-width on
    * a number; prefix on a lexicographically-ordered string), which is
    * what makes range pruning on the SOURCE column sound: `col >= X` can
    * only match directories whose token is >= truncate(X). The id-range
    * and key-prefix layout for columns too granular for identity
    * partitioning and too range-queried for hash buckets. */
  final case class Truncate(w: Int, col: String) extends Field {
    require(w > 0, s"truncate width must be positive, got $w")
    def dir: String = s"$col.trunc"
    def spec: String = s"truncate($w,$col)"

    /** Directory token of a Catalyst OR external value; null for null. */
    def tokenOf(dt: DataType, value: Any): String = {
      if (value == null) return null
      dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          val v = value.asInstanceOf[Number].longValue()
          String.valueOf(v - java.lang.Math.floorMod(v, w.toLong))
        case StringType =>
          val s = value match {
            case u: UTF8String => u.toString
            case s => String.valueOf(s)
          }
          if (s.length <= w) s else s.substring(0, w)
        case other =>
          throw new IllegalArgumentException(s"graft: truncate over $other not supported")
      }
    }

    private def numeric(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }

    /** Token comparison in VALUE order: numeric for integral columns,
      * lexicographic for strings (matches prefix monotonicity). */
    private def cmp(dt: DataType, a: String, b: String): Int =
      if (numeric(dt)) java.lang.Long.compare(a.toLong, b.toLong)
      else a.compareTo(b)

    /** Can a row in directory `token` (null = null directory) satisfy
      * `f`? Same conservative Kleene shape as [[unitMayMatch]]. */
    def mayMatch(f: org.apache.spark.sql.sources.Filter, dt: DataType,
                 token: String): Boolean = {
      import org.apache.spark.sql.sources._
      def t(v: Any): String = tokenOf(dt, v)
      f match {
        case EqualTo(a, v) if a == col =>
          v != null && token != null && t(v) == token
        case EqualNullSafe(a, v) if a == col =>
          if (v == null) token == null else token != null && t(v) == token
        case In(a, vs) if a == col && vs.nonEmpty =>
          token != null && vs.exists(v => v != null && t(v) == token)
        case GreaterThan(a, v) if a == col && v != null =>
          token != null && cmp(dt, token, t(v)) >= 0
        case GreaterThanOrEqual(a, v) if a == col && v != null =>
          token != null && cmp(dt, token, t(v)) >= 0
        case LessThan(a, v) if a == col && v != null =>
          token != null && cmp(dt, token, t(v)) <= 0
        case LessThanOrEqual(a, v) if a == col && v != null =>
          token != null && cmp(dt, token, t(v)) <= 0
        case StringStartsWith(a, p) if a == col && p != null && !numeric(dt) =>
          // directory token and prefix constrain each other on their
          // common length — sound both when w <= len(p) and beyond
          token != null && {
            val n = math.min(token.length, p.length)
            token.substring(0, n) == p.substring(0, n)
          }
        case IsNull(a) if a == col => token == null
        case IsNotNull(a) if a == col => token != null
        case And(l, r) => mayMatch(l, dt, token) && mayMatch(r, dt, token)
        case Or(l, r) => mayMatch(l, dt, token) || mayMatch(r, dt, token)
        case _ => true
      }
    }
  }

  /** Column types `truncate(w, col)` supports. */
  def supportsTruncType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** Does a manifest rel path's DIRECTORY STRUCTURE match `fields`? Name
    * check only — parameter-only spec changes (bucket count, truncate
    * width) produce identical directory names, so callers must ALSO
    * compare the file's data sequence number against the spec's
    * effective-since version ([[GraftTable.SpecSinceProp]]) before
    * trusting a parse. The one shared matcher for scan, delete routing,
    * and compaction. */
  def layoutMatches(rel: String, fields: Seq[Field]): Boolean = {
    val segs = rel.split('/')
    segs.length == fields.length + 1 &&
      fields.zip(segs.dropRight(1)).forall { case (f, seg) =>
        seg.split("=", 2) match {
          case Array(c, _) => c == f.dir
          case _ => false
        }
      }
  }

  private val B = """bucket\((\d+),(.+)\)""".r
  private val D = """days\((.+)\)""".r
  private val M = """months\((.+)\)""".r
  private val H = """hours\((.+)\)""".r
  private val T = """truncate\((\d+),(.+)\)""".r

  def parse(s: String): Field = s match {
    case B(n, c) => Bucket(n.toInt, c.trim)
    case D(c) => Days(c.trim)
    case M(c) => Months(c.trim)
    case H(c) => Hours(c.trim)
    case T(w, c) => Truncate(w.toInt, c.trim)
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
    case t if t.name() == "months" && t.references().length == 1 =>
      Months(t.references()(0).fieldNames().mkString("."))
    case t if t.name() == "hours" && t.references().length == 1 =>
      Hours(t.references()(0).fieldNames().mkString("."))
    case t if t.name() == "truncate" && t.references().length == 1 =>
      val w = t.arguments().collectFirst {
        case lit: org.apache.spark.sql.connector.expressions.Literal[_]
            if lit.value().isInstanceOf[Number] =>
          lit.value().asInstanceOf[Number].intValue()
      }.getOrElse(throw new IllegalArgumentException(
        s"graft: truncate transform without a width: $t"))
      Truncate(w, t.references()(0).fieldNames().mkString("."))
    case other => throw new UnsupportedOperationException(
      s"graft: unsupported partition transform $other " +
        "(identity, bucket(n, col), days/months/hours(col), truncate(w, col) only)")
  }

  /** Field → connector `Transform` (inverse of [[fromTransform]]). */
  def toTransform(f: Field): org.apache.spark.sql.connector.expressions.Transform = {
    import org.apache.spark.sql.connector.expressions.Expressions
    f match {
      case Identity(c) => Expressions.identity(c)
      case Bucket(n, c) => Expressions.bucket(n, c)
      case Days(c) => Expressions.days(c)
      case Months(c) => Expressions.months(c)
      case Hours(c) => Expressions.hours(c)
      case Truncate(w, c) =>
        Expressions.apply("truncate",
          Expressions.literal(Int.box(w)), Expressions.column(c))
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

  /** Can a row whose `field.col` falls in time unit `unit` (null = the
    * null directory) satisfy filter `f`? Sound because `floorOf` is
    * monotonic in the column value. Conservative Kleene collapse: only
    * provable exclusions return false, unknown shapes (Not, unrelated
    * columns) keep the directory. Top-level filters are conjunctive —
    * the caller requires every filter to allow the unit. */
  def unitMayMatch(
      f: org.apache.spark.sql.sources.Filter,
      field: TimeUnitField,
      dt: DataType,
      unit: java.lang.Long): Boolean = {
    import org.apache.spark.sql.sources._
    def u(v: Any): java.lang.Long = field.floorOf(dt, v)
    f match {
      case EqualTo(a, v) if a == field.col =>
        v != null && unit != null && u(v) == unit
      case EqualNullSafe(a, v) if a == field.col =>
        if (v == null) unit == null else unit != null && u(v) == unit
      case In(a, vs) if a == field.col && vs.nonEmpty =>
        unit != null && vs.exists(v => v != null && u(v) == unit)
      case GreaterThan(a, v) if a == field.col && v != null =>
        unit != null && unit >= u(v)
      case GreaterThanOrEqual(a, v) if a == field.col && v != null =>
        unit != null && unit >= u(v)
      case LessThan(a, v) if a == field.col && v != null =>
        unit != null && unit <= u(v)
      case LessThanOrEqual(a, v) if a == field.col && v != null =>
        unit != null && unit <= u(v)
      case IsNull(a) if a == field.col => unit == null
      case IsNotNull(a) if a == field.col => unit != null
      case And(l, r) =>
        unitMayMatch(l, field, dt, unit) && unitMayMatch(r, field, dt, unit)
      case Or(l, r) =>
        unitMayMatch(l, field, dt, unit) || unitMayMatch(r, field, dt, unit)
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
