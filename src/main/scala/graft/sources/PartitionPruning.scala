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

  private def isIntegral(n: Number): Boolean = n match {
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
        _: java.lang.Long => true
    case _ => false
  }

  /** Days-since-epoch for any date-ish value Spark may hand us: filter
    * values arrive as `java.sql.Date` (default) or `java.time.LocalDate`
    * (datetime.java8API.enabled). */
  private def epochDays(a: Any): Option[Long] = a match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    // integral-vs-integral must NOT go through double: longs beyond 2^53
    // lose precision and mis-prune (missing rows) or mis-delete
    case (x: Number, y: Number) if isIntegral(x) && isIntegral(y) =>
      Some(java.lang.Long.compare(x.longValue(), y.longValue()))
    case (x: Number, y: Number) =>
      Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ =>
      (epochDays(a), epochDays(b)) match {
        case (Some(x), Some(y)) => Some(java.lang.Long.compare(x, y))
        case _ => None
      }
  }

  /** Four-valued filter evaluation over a partition's (uniform) column
    * values: SQL's three truth values (a NULL comparand yields [[VUnknown]],
    * which a WHERE clause treats as "row rejected" but which [[Not]] must
    * NOT flip to true — Kleene logic), plus [[VUndecided]] for filters the
    * evaluator genuinely cannot decide from partition values alone. */
  sealed trait V4
  case object VTrue extends V4
  case object VFalse extends V4
  case object VUnknown extends V4
  case object VUndecided extends V4

  private def ofCmp(c: Option[Int], nullInvolved: Boolean)(p: Int => Boolean): V4 =
    if (nullInvolved) VUnknown
    else c match {
      case Some(i) => if (p(i)) VTrue else VFalse
      case None => VUndecided
    }

  def eval4(f: Filter, v: Map[String, Any]): V4 = f match {
    case _: AlwaysTrue => VTrue
    case _: AlwaysFalse => VFalse
    case EqualTo(a, x) if v.contains(a) =>
      ofCmp(cmp(v(a), x), v(a) == null || x == null)(_ == 0)
    case EqualNullSafe(a, x) if v.contains(a) =>
      if (v(a) == null || x == null) { if (v(a) == null && x == null) VTrue else VFalse }
      else ofCmp(cmp(v(a), x), nullInvolved = false)(_ == 0)
    case GreaterThan(a, x) if v.contains(a) =>
      ofCmp(cmp(v(a), x), v(a) == null || x == null)(_ > 0)
    case GreaterThanOrEqual(a, x) if v.contains(a) =>
      ofCmp(cmp(v(a), x), v(a) == null || x == null)(_ >= 0)
    case LessThan(a, x) if v.contains(a) =>
      ofCmp(cmp(v(a), x), v(a) == null || x == null)(_ < 0)
    case LessThanOrEqual(a, x) if v.contains(a) =>
      ofCmp(cmp(v(a), x), v(a) == null || x == null)(_ <= 0)
    case In(a, xs) if v.contains(a) =>
      if (v(a) == null) { if (xs.isEmpty) VFalse else VUnknown }
      else if (xs.exists(x => x != null && cmp(v(a), x).contains(0))) VTrue
      else if (xs.forall(x => x != null && cmp(v(a), x).isDefined)) VFalse
      else if (xs.contains(null)) VUnknown
      else VUndecided
    case IsNull(a) if v.contains(a) => if (v(a) == null) VTrue else VFalse
    case IsNotNull(a) if v.contains(a) => if (v(a) != null) VTrue else VFalse
    case StringStartsWith(a, p) if v.contains(a) => v(a) match {
      case null => VUnknown
      case s: String => if (s.startsWith(p)) VTrue else VFalse
      case _ => VUndecided
    }
    case And(l, r) => (eval4(l, v), eval4(r, v)) match {
      case (VFalse, _) | (_, VFalse) => VFalse
      case (VUndecided, _) | (_, VUndecided) => VUndecided
      case (VUnknown, _) | (_, VUnknown) => VUnknown
      case _ => VTrue
    }
    case Or(l, r) => (eval4(l, v), eval4(r, v)) match {
      case (VTrue, _) | (_, VTrue) => VTrue
      case (VUndecided, _) | (_, VUndecided) => VUndecided
      case (VUnknown, _) | (_, VUnknown) => VUnknown
      case _ => VFalse
    }
    case Not(c) => eval4(c, v) match {
      case VTrue => VFalse
      case VFalse => VTrue
      case other => other // Unknown stays unknown; undecided stays undecided
    }
    case _ => VUndecided
  }

  /** Collapsed view: Some(true) iff the filter definitely passes rows,
    * Some(false) iff it definitely passes NO rows (false OR unknown — a
    * WHERE clause rejects both), None iff undecidable from partition
    * values. */
  def eval3(f: Filter, v: Map[String, Any]): Option[Boolean] = eval4(f, v) match {
    case VTrue => Some(true)
    case VFalse | VUnknown => Some(false)
    case VUndecided => None
  }

  /** True iff `f` provably matches NO row of a file whose per-column
    * [min, max] ranges (external string form, from the stats registry)
    * are `ranges`. Conservative: anything undecidable returns false. */
  def rangeDisproves(
      f: Filter,
      ranges: Map[String, (String, String)],
      schema: org.apache.spark.sql.types.StructType): Boolean = {
    def range(col: String): Option[(Any, Any)] =
      for {
        (mn, mx) <- ranges.get(col)
        field <- schema.fields.find(_.name == col)
      } yield (parse(field.dataType, mn), parse(field.dataType, mx))
    f match {
      case EqualTo(a, v) => range(a).exists { case (mn, mx) =>
        cmp(v, mn).exists(_ < 0) || cmp(v, mx).exists(_ > 0) }
      case GreaterThan(a, v) => range(a).exists { case (_, mx) =>
        cmp(mx, v).exists(_ <= 0) }
      case GreaterThanOrEqual(a, v) => range(a).exists { case (_, mx) =>
        cmp(mx, v).exists(_ < 0) }
      case LessThan(a, v) => range(a).exists { case (mn, _) =>
        cmp(mn, v).exists(_ >= 0) }
      case LessThanOrEqual(a, v) => range(a).exists { case (mn, _) =>
        cmp(mn, v).exists(_ > 0) }
      case In(a, vs) => vs.nonEmpty && range(a).exists { case (mn, mx) =>
        vs.forall(v => v != null &&
          (cmp(v, mn).exists(_ < 0) || cmp(v, mx).exists(_ > 0))) }
      case StringStartsWith(a, p) => range(a).exists {
        case (mn: String, mx: String) =>
          // matching strings s satisfy p <= s and s.startsWith(p)
          mx < p || (mn > p && !mn.startsWith(p))
        case _ => false
      }
      case And(l, r) =>
        rangeDisproves(l, ranges, schema) || rangeDisproves(r, ranges, schema)
      case Or(l, r) =>
        rangeDisproves(l, ranges, schema) && rangeDisproves(r, ranges, schema)
      case _ => false
    }
  }

  /** Directory token for a null partition value. */
  val NullToken = "__null__"

  /** Directory-name-safe encoding of a partition value. */
  def encode(value: Any): String = value match {
    case null => "__null__"
    case other =>
      val s = String.valueOf(other)
      java.net.URLEncoder.encode(s, "UTF-8")
  }

  /** Encode a CATALYST partition value (what the write path sees) in its
    * external form, so `parse` round-trips it: DateType arrives as Int
    * days-since-epoch and must become `yyyy-MM-dd`, StringType arrives as
    * UTF8String. Everything else stringifies to its external form already. */
  def encodeCatalyst(dt: DataType, value: Any): String =
    if (value == null) "__null__"
    else dt match {
      case DateType => encode(java.time.LocalDate.ofEpochDay(
        value.asInstanceOf[Number].longValue()).toString)
      case _ => encode(value)
    }

  /** Partition column types the round-trip (encodeCatalyst -> dir name ->
    * parse -> cmp) supports. Checked at CREATE TABLE so unsupported types
    * (timestamp, decimal, binary, ...) fail loudly up front instead of at
    * first read. */
  def supportsPartitionType(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
        DoubleType | FloatType | BooleanType | DateType => true
    case _ => false
  }

  def decode(raw: String): String =
    if (raw == "__null__") raw else java.net.URLDecoder.decode(raw, "UTF-8")
}
