package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Static partition pruning for the graft source: evaluates pushed
  * `sources.Filter`s against a partition's (uniform) column values with
  * three-valued logic, so directories whose filters are provably false are
  * never listed into the scan. The reference throws on all partition APIs
  * (`HBaseExternalCatalog.scala:139-149`); at 100 TB this is the
  * difference between scanning one day and scanning ten years.
  */
object PartitionPruning {

  /** Parse the directory-encoded value (`col=v`) into the column's type. */
  def parse(dt: DataType, raw: String): Any =
    if (raw == "__null__") null
    else dt match {
      case StringType => raw
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case ShortType => raw.toShort
      case ByteType => raw.toByte
      case DoubleType => raw.toDouble
      case FloatType => raw.toFloat
      case BooleanType => raw.toBoolean
      case DateType => java.sql.Date.valueOf(raw)
      case other => throw new IllegalArgumentException(
        s"unsupported partition column type $other")
    }

  /** Keep the partition unless some pushed filter is provably false. */
  def prune(filters: Seq[Filter], values: Map[String, Any]): Boolean =
    filters.exists(f => eval3(f, values).contains(false))

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: Number, y: Number) =>
      Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  /** Some(true/false) when decidable from partition values, None otherwise. */
  def eval3(f: Filter, v: Map[String, Any]): Option[Boolean] = f match {
    case EqualTo(a, x) if v.contains(a) => cmp(v(a), x).map(_ == 0)
    case GreaterThan(a, x) if v.contains(a) => cmp(v(a), x).map(_ > 0)
    case GreaterThanOrEqual(a, x) if v.contains(a) => cmp(v(a), x).map(_ >= 0)
    case LessThan(a, x) if v.contains(a) => cmp(v(a), x).map(_ < 0)
    case LessThanOrEqual(a, x) if v.contains(a) => cmp(v(a), x).map(_ <= 0)
    case In(a, xs) if v.contains(a) =>
      if (v(a) == null) Some(false)
      else Some(xs.exists(x => cmp(v(a), x).contains(0)))
    case IsNull(a) if v.contains(a) => Some(v(a) == null)
    case IsNotNull(a) if v.contains(a) => Some(v(a) != null)
    case StringStartsWith(a, p) if v.contains(a) => v(a) match {
      case s: String => Some(s.startsWith(p))
      case _ => None
    }
    case And(l, r) => (eval3(l, v), eval3(r, v)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval3(l, v), eval3(r, v)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(c) => eval3(c, v).map(!_)
    case _ => None
  }

  /** Directory-name-safe encoding of a partition value. */
  def encode(value: Any): String = value match {
    case null => "__null__"
    case other =>
      val s = String.valueOf(other)
      java.net.URLEncoder.encode(s, "UTF-8")
  }

  def decode(raw: String): String =
    if (raw == "__null__") raw else java.net.URLDecoder.decode(raw, "UTF-8")
}
