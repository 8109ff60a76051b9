package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{ByteCodecs, ColumnNames}

class CodecSpec extends AnyFunSuite {

  private val rnd = new Random(42)

  private def longs = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue) ++
    Seq.fill(200)(rnd.nextLong())
  private def ints = Seq(0, 1, -1, Int.MaxValue, Int.MinValue) ++
    Seq.fill(200)(rnd.nextInt())
  private def doubles = Seq(0.0, -0.0, 1.5, -1.5, Double.MaxValue,
    Double.MinValue, Double.MinPositiveValue, 1e-300, -1e-300) ++
    Seq.fill(200)(rnd.nextDouble() * math.pow(10, rnd.nextInt(40) - 20) *
      (if (rnd.nextBoolean()) 1 else -1))

  test("column name combine/split round-trips") {
    for (_ <- 1 to 200) {
      val fam = rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString
      val qual = rnd.nextString(rnd.nextInt(12))
      val name = ColumnNames.combine(fam, qual)
      assert(ColumnNames.split(name) == ((fam, qual)))
    }
    // qualifier may contain the splitter: split on first colon only
    assert(ColumnNames.split("f:a:b") == (("f", "a:b")))
    intercept[IllegalArgumentException](ColumnNames.combine("a:b", "q"))
    intercept[IllegalArgumentException](ColumnNames.split("noColon"))
  }

  test("byte codecs round-trip every supported type") {
    longs.foreach(v => assert(ByteCodecs.decode(LongType, ByteCodecs.encode(LongType, v)) == v))
    ints.foreach(v => assert(ByteCodecs.decode(IntegerType, ByteCodecs.encode(IntegerType, v)) == v))
    ints.map(_.toShort).foreach(v =>
      assert(ByteCodecs.decode(ShortType, ByteCodecs.encode(ShortType, v)) == v))
    doubles.foreach(v =>
      assert(ByteCodecs.decode(DoubleType, ByteCodecs.encode(DoubleType, v)) == v))
    doubles.map(_.toFloat).foreach(v =>
      assert(ByteCodecs.decode(FloatType, ByteCodecs.encode(FloatType, v)) == v))
    Seq(true, false).foreach(v =>
      assert(ByteCodecs.decode(BooleanType, ByteCodecs.encode(BooleanType, v)) == v))
    Seq("", "abc", "ünïcødé ☃", rnd.nextString(50)).foreach(v =>
      assert(ByteCodecs.decode(StringType, ByteCodecs.encode(StringType, v)) ==
        UTF8String.fromString(v)))
    assert(ByteCodecs.encode(LongType, null) == null)
    assert(ByteCodecs.decode(LongType, null) == null)
  }

  test("ordered encoding preserves value order under unsigned byte comparison") {
    // the reference mis-orders negatives (BinaryComparator over two's
    // complement bytes, SURVEY.md §7); the ordered variant must not
    def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return Integer.signum(c)
        i += 1
      }
      Integer.signum(a.length - b.length)
    }
    val ls = longs
    for (x <- ls; y <- ls.take(20)) {
      val bx = ByteCodecs.orderedEncode(LongType, x)
      assert(ByteCodecs.orderedDecode(LongType, bx) == x)
      assert(cmp(bx, ByteCodecs.orderedEncode(LongType, y)) ==
        Integer.signum(java.lang.Long.compare(x, y)))
    }
    val ds = doubles.filterNot(_.isNaN)
    for (x <- ds; y <- ds.take(20)) {
      val bx = ByteCodecs.orderedEncode(DoubleType, x)
      assert(ByteCodecs.orderedDecode(DoubleType, bx) == x)
      assert(cmp(bx, ByteCodecs.orderedEncode(DoubleType, y)) ==
        Integer.signum(java.lang.Double.compare(x, y)))
    }
    val is = ints
    for (x <- is; y <- is.take(20)) {
      val bx = ByteCodecs.orderedEncode(IntegerType, x)
      assert(ByteCodecs.orderedDecode(IntegerType, bx) == x)
      assert(cmp(bx, ByteCodecs.orderedEncode(IntegerType, y)) ==
        Integer.signum(Integer.compare(x, y)))
    }
  }
}
