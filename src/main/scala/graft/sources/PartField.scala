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

  private val B = """bucket\((\d+),(.+)\)""".r

  def parse(s: String): Field = s match {
    case B(n, c) => Bucket(n.toInt, c.trim)
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
    case other => throw new UnsupportedOperationException(
      s"graft: unsupported partition transform $other " +
        "(identity and bucket(n, col) only)")
  }

  /** Field → connector `Transform` (inverse of [[fromTransform]]). */
  def toTransform(f: Field): org.apache.spark.sql.connector.expressions.Transform = {
    import org.apache.spark.sql.connector.expressions.Expressions
    f match {
      case Identity(c) => Expressions.identity(c)
      case Bucket(n, c) => Expressions.bucket(n, c)
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
