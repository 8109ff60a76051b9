package graft.sources

import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate, Operators}
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Spark `sources.Filter` → parquet `FilterPredicate`, the capability
  * analog of the reference's Catalyst→HBase-`FilterList` translator
  * (`HBaseSparkFilterUtils.scala:23-129`), with the semantics fixed:
  *
  *  - unsupported conjuncts are NEVER silently dropped — the scan reports
  *    every filter as a residual so Spark re-evaluates them post-scan
  *    (the reference loses unconvertible predicates, SURVEY.md §2.1 #10);
  *  - StartsWith/EndsWith/Contains keep their correct meanings (the
  *    reference swaps the first two, SURVEY.md §2.1 #9) — parquet has no
  *    substring predicate, so only StartsWith maps (to a min/max-friendly
  *    user-defined range via binary bounds); the rest stay residual-only.
  *
  * The translated predicate drives row-group and page-level skipping plus
  * parquet-mr record-level filtering; correctness never depends on it.
  */
object FilterTranslate {

  private val MaxInValues = 32

  /** External timestamp filter value → the INT64 micros the files store. */
  private def microsOf(v: Any): java.lang.Long = v match {
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
    case n: Number => n.longValue()
  }

  /** External date filter value → the INT32 epoch days the files store. */
  private def daysOf(v: Any): java.lang.Integer = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case n: Number => n.intValue()
  }

  def translate(schema: StructType, f: Filter): Option[FilterPredicate] = {
    def typeOf(attr: String): Option[DataType] =
      schema.fields.find(_.name == attr).map(_.dataType)

    def eq(attr: String, v: Any, negate: Boolean): Option[FilterPredicate] =
      typeOf(attr).flatMap {
        case IntegerType =>
          val c = FilterApi.intColumn(attr)
          val j = if (v == null) null else java.lang.Integer.valueOf(v.asInstanceOf[Number].intValue())
          Some(if (negate) FilterApi.notEq(c, j) else FilterApi.eq(c, j))
        case LongType =>
          val c = FilterApi.longColumn(attr)
          val j = if (v == null) null else java.lang.Long.valueOf(v.asInstanceOf[Number].longValue())
          Some(if (negate) FilterApi.notEq(c, j) else FilterApi.eq(c, j))
        case DoubleType =>
          val c = FilterApi.doubleColumn(attr)
          val j = if (v == null) null else java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue())
          Some(if (negate) FilterApi.notEq(c, j) else FilterApi.eq(c, j))
        case FloatType =>
          val c = FilterApi.floatColumn(attr)
          val j = if (v == null) null else java.lang.Float.valueOf(v.asInstanceOf[Number].floatValue())
          Some(if (negate) FilterApi.notEq(c, j) else FilterApi.eq(c, j))
        case BooleanType =>
          val c = FilterApi.booleanColumn(attr)
          val j = if (v == null) null else java.lang.Boolean.valueOf(v.asInstanceOf[Boolean])
          Some(if (negate) FilterApi.notEq(c, j) else FilterApi.eq(c, j))
        case StringType =>
          val c = FilterApi.binaryColumn(attr)
          val j = if (v == null) null else Binary.fromString(v.toString)
          Some(if (negate) FilterApi.notEq(c, j) else FilterApi.eq(c, j))
        case BinaryType =>
          val c = FilterApi.binaryColumn(attr)
          val j = if (v == null) null else Binary.fromConstantByteArray(v.asInstanceOf[Array[Byte]])
          Some(if (negate) FilterApi.notEq(c, j) else FilterApi.eq(c, j))
        case DateType =>
          val c = FilterApi.intColumn(attr)
          val j = if (v == null) null else daysOf(v)
          Some(if (negate) FilterApi.notEq(c, j) else FilterApi.eq(c, j))
        case TimestampType | TimestampNTZType =>
          val c = FilterApi.longColumn(attr)
          val j = if (v == null) null else microsOf(v)
          Some(if (negate) FilterApi.notEq(c, j) else FilterApi.eq(c, j))
        case _ => None
      }

    def cmp(attr: String, v: Any, op: String): Option[FilterPredicate] =
      typeOf(attr).flatMap {
        case IntegerType =>
          val c = FilterApi.intColumn(attr)
          val j = java.lang.Integer.valueOf(v.asInstanceOf[Number].intValue())
          Some(op match {
            case "gt" => FilterApi.gt(c, j); case "ge" => FilterApi.gtEq(c, j)
            case "lt" => FilterApi.lt(c, j); case _ => FilterApi.ltEq(c, j)
          })
        case LongType =>
          val c = FilterApi.longColumn(attr)
          val j = java.lang.Long.valueOf(v.asInstanceOf[Number].longValue())
          Some(op match {
            case "gt" => FilterApi.gt(c, j); case "ge" => FilterApi.gtEq(c, j)
            case "lt" => FilterApi.lt(c, j); case _ => FilterApi.ltEq(c, j)
          })
        case DoubleType =>
          val c = FilterApi.doubleColumn(attr)
          val j = java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue())
          Some(op match {
            case "gt" => FilterApi.gt(c, j); case "ge" => FilterApi.gtEq(c, j)
            case "lt" => FilterApi.lt(c, j); case _ => FilterApi.ltEq(c, j)
          })
        case FloatType =>
          val c = FilterApi.floatColumn(attr)
          val j = java.lang.Float.valueOf(v.asInstanceOf[Number].floatValue())
          Some(op match {
            case "gt" => FilterApi.gt(c, j); case "ge" => FilterApi.gtEq(c, j)
            case "lt" => FilterApi.lt(c, j); case _ => FilterApi.ltEq(c, j)
          })
        case StringType =>
          val c = FilterApi.binaryColumn(attr)
          val j = Binary.fromString(v.toString)
          Some(op match {
            case "gt" => FilterApi.gt(c, j); case "ge" => FilterApi.gtEq(c, j)
            case "lt" => FilterApi.lt(c, j); case _ => FilterApi.ltEq(c, j)
          })
        case DateType =>
          val c = FilterApi.intColumn(attr)
          val j = daysOf(v)
          Some(op match {
            case "gt" => FilterApi.gt(c, j); case "ge" => FilterApi.gtEq(c, j)
            case "lt" => FilterApi.lt(c, j); case _ => FilterApi.ltEq(c, j)
          })
        case TimestampType | TimestampNTZType =>
          val c = FilterApi.longColumn(attr)
          val j = microsOf(v)
          Some(op match {
            case "gt" => FilterApi.gt(c, j); case "ge" => FilterApi.gtEq(c, j)
            case "lt" => FilterApi.lt(c, j); case _ => FilterApi.ltEq(c, j)
          })
        case _ => None
      }

    f match {
      // Trivial predicates (constant-folded `WHERE true` / `1=0`, DPP
      // fallbacks): parquet has no constant FilterPredicate, and a
      // trivially-true filter prunes nothing anyway — handled explicitly
      // (not via the default arm) so the Or-algebra below can simplify
      // around them instead of declining the whole disjunction.
      case _: AlwaysTrue | _: AlwaysFalse => None
      case EqualTo(a, v) => eq(a, v, negate = false)
      case GreaterThan(a, v) => cmp(a, v, "gt")
      case GreaterThanOrEqual(a, v) => cmp(a, v, "ge")
      case LessThan(a, v) => cmp(a, v, "lt")
      case LessThanOrEqual(a, v) => cmp(a, v, "le")
      case IsNull(a) => eq(a, null, negate = false)
      case IsNotNull(a) => eq(a, null, negate = true)
      case In(a, vs) if vs.nonEmpty && vs.length <= MaxInValues =>
        val parts = vs.toSeq.map(v => eq(a, v, negate = false))
        if (parts.forall(_.isDefined)) Some(parts.flatten.reduce(FilterApi.or)) else None
      case And(l, r) =>
        // one translatable side still prunes (sound for conjunction)
        (translate(schema, l), translate(schema, r)) match {
          case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
          case (Some(a), None) => Some(a)
          case (None, Some(b)) => Some(b)
          case _ => None
        }
      case Or(l, r) =>
        (l, r) match {
          // false ∨ x ≡ x — the other side's pruning survives; a
          // trivially-true side makes the whole disjunction true (nothing
          // to prune, stays residual-only)
          case (_: AlwaysFalse, _) => translate(schema, r)
          case (_, _: AlwaysFalse) => translate(schema, l)
          case (_: AlwaysTrue, _) | (_, _: AlwaysTrue) => None
          case _ =>
            for {
              a <- translate(schema, l)
              b <- translate(schema, r)
            } yield FilterApi.or(a, b)
        }
      case Not(child) =>
        // sound only when the child translated exactly; restrict to EqualTo
        child match {
          case EqualTo(a, v) => eq(a, v, negate = true)
          case _ => None
        }
      case StringStartsWith(a, prefix) if prefix.nonEmpty =>
        typeOf(a).collect { case StringType =>
          // prefix p → p <= col < p' where p' bumps the last byte; falls
          // back to ge-only when the prefix is all 0xff.
          val c = FilterApi.binaryColumn(a)
          val lower = FilterApi.gtEq(c, Binary.fromString(prefix))
          upperBound(prefix) match {
            case Some(u) => FilterApi.and(lower, FilterApi.lt(c, Binary.fromConstantByteArray(u)))
            case None => lower
          }
        }
      case _ => None
    }
  }

  /** Smallest byte string strictly greater than every string with the
    * given prefix (increment last non-0xff byte, truncate after it). */
  private[graft] def upperBound(prefix: String): Option[Array[Byte]] = {
    val b = prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = b.length - 1
    while (i >= 0 && b(i) == 0xff.toByte) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(b, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }
}
