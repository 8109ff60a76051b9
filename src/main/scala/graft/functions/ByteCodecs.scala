package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Typed value ⇄ byte-array codecs, the capability analog of the
  * reference's `HBaseSparkDataUtils.scala` (SURVEY.md §1.4): big-endian
  * fixed-width encodings for numeric types, UTF-8 for strings, raw bytes
  * for binary. Used by the KV file source and the row-key generators.
  *
  * Deliberate deviations from the reference (SURVEY.md §7 "hardening"):
  *  - timestamps keep MICROsecond precision (the reference truncates to
  *    millis, `HBaseSparkDataUtils.scala:33-34`);
  *  - signed numerics get an order-preserving variant ([[orderedEncode]])
  *    that flips the sign bit, fixing the reference's mis-ordering of
  *    negative values under unsigned byte comparison.
  */
object ByteCodecs {

  // ---- plain codecs (round-trip value ⇄ bytes) ---------------------------

  def encode(dt: DataType, v: Any): Array[Byte] = v match {
    case null => null
    case _ => dt match {
      case BooleanType => Array(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
      case ByteType => Array(v.asInstanceOf[Byte])
      case ShortType => be(v.asInstanceOf[Short].toLong, 2)
      case IntegerType | DateType => be(v.asInstanceOf[Int].toLong, 4)
      case LongType | TimestampType | TimestampNTZType => be(v.asInstanceOf[Long], 8)
      case FloatType => be(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong, 4)
      case DoubleType => be(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
      case StringType => v match {
        case s: UTF8String => s.getBytes
        case s: String => s.getBytes(StandardCharsets.UTF_8)
      }
      case BinaryType => v.asInstanceOf[Array[Byte]]
      case other => throw new IllegalArgumentException(s"no codec for $other")
    }
  }

  def decode(dt: DataType, b: Array[Byte]): Any =
    if (b == null) null
    else dt match {
      case BooleanType => b(0) != 0
      case ByteType => b(0)
      case ShortType => ube(b, 2).toShort
      case IntegerType | DateType => ube(b, 4).toInt
      case LongType | TimestampType | TimestampNTZType => ube(b, 8)
      case FloatType => java.lang.Float.intBitsToFloat(ube(b, 4).toInt)
      case DoubleType => java.lang.Double.longBitsToDouble(ube(b, 8))
      case StringType => UTF8String.fromBytes(b)
      case BinaryType => b
      case other => throw new IllegalArgumentException(s"no codec for $other")
    }

  // ---- order-preserving variant (unsigned-lexicographic = value order) ---

  /** Encoding whose unsigned byte-wise comparison matches SQL ordering:
    * integers get the sign bit flipped; floats use the standard
    * total-order transform (flip sign bit, or all bits when negative). */
  def orderedEncode(dt: DataType, v: Any): Array[Byte] = v match {
    case null => null
    case _ => dt match {
      case ShortType => be((v.asInstanceOf[Short] ^ 0x8000).toLong & 0xffffL, 2)
      case IntegerType | DateType => be((v.asInstanceOf[Int] ^ 0x80000000).toLong & 0xffffffffL, 4)
      case LongType | TimestampType | TimestampNTZType =>
        be(v.asInstanceOf[Long] ^ Long.MinValue, 8)
      case FloatType =>
        val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
        val t = if (bits < 0) ~bits else bits ^ Int.MinValue
        be(t.toLong & 0xffffffffL, 4)
      case DoubleType =>
        val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
        val t = if (bits < 0) ~bits else bits ^ Long.MinValue
        be(t, 8)
      case _ => encode(dt, v)
    }
  }

  def orderedDecode(dt: DataType, b: Array[Byte]): Any =
    if (b == null) null
    else dt match {
      case ShortType => (ube(b, 2) ^ 0x8000L).toShort
      case IntegerType | DateType => (ube(b, 4) ^ 0x80000000L).toInt
      case LongType | TimestampType | TimestampNTZType => ube(b, 8) ^ Long.MinValue
      case FloatType =>
        val raw = ube(b, 4).toInt
        java.lang.Float.intBitsToFloat(if (raw < 0) raw ^ Int.MinValue else ~raw)
      case DoubleType =>
        val raw = ube(b, 8)
        java.lang.Double.longBitsToDouble(if (raw < 0) raw ^ Long.MinValue else ~raw)
      case _ => decode(dt, b)
    }

  // ---- helpers -----------------------------------------------------------

  /** Big-endian fixed-width encode of the low `n` bytes of `v`. */
  private def be(v: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(n - 1 - i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  /** Big-endian decode of `n` bytes, sign-extended from width `n`. */
  private def ube(b: Array[Byte], n: Int): Long = {
    require(b.length == n, s"expected $n bytes, got ${b.length}")
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    // sign-extend
    val shift = 64 - 8 * n
    (v << shift) >> shift
  }
}
