package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.sources.{FilterTranslate, PartitionPruning}

class FilterTranslateSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("i", IntegerType), StructField("l", LongType),
    StructField("d", DoubleType), StructField("s", StringType),
    StructField("b", BooleanType), StructField("arr", ArrayType(IntegerType))))

  test("translatable shapes produce predicates; unsupported types do not") {
    assert(FilterTranslate.translate(schema, EqualTo("i", 5)).isDefined)
    assert(FilterTranslate.translate(schema, GreaterThan("d", 1.5)).isDefined)
    assert(FilterTranslate.translate(schema, LessThanOrEqual("s", "m")).isDefined)
    assert(FilterTranslate.translate(schema, IsNull("l")).isDefined)
    assert(FilterTranslate.translate(schema, In("i", Array(1, 2, 3))).isDefined)
    assert(FilterTranslate.translate(schema, StringStartsWith("s", "ab")).isDefined)
    // unsupported: array column, unknown attribute, oversized IN
    assert(FilterTranslate.translate(schema, EqualTo("arr", Seq(1))).isEmpty)
    assert(FilterTranslate.translate(schema, EqualTo("nope", 1)).isEmpty)
    assert(FilterTranslate.translate(schema, In("i", (1 to 100).toArray.map(_.asInstanceOf[Any]))).isEmpty)
  }

  test("And keeps a translatable side; Or requires both; Not only exact children") {
    val good = EqualTo("i", 1)
    val bad = EqualTo("arr", Seq(1))
    assert(FilterTranslate.translate(schema, And(good, bad)).isDefined) // sound for conjunction
    assert(FilterTranslate.translate(schema, Or(good, bad)).isEmpty)    // unsound otherwise
    assert(FilterTranslate.translate(schema, Not(good)).isDefined)
    assert(FilterTranslate.translate(schema, Not(GreaterThan("i", 1))).isEmpty)
  }

  test("AlwaysTrue/AlwaysFalse are handled as trivial predicates") {
    val good = EqualTo("i", 1)
    // trivially-true/false leaves translate to no parquet predicate...
    assert(FilterTranslate.translate(schema, AlwaysTrue).isEmpty)
    assert(FilterTranslate.translate(schema, AlwaysFalse).isEmpty)
    // ...but the Or algebra simplifies around them instead of declining:
    // false ∨ x ≡ x keeps x's pruning; true ∨ x is trivially true (none)
    assert(FilterTranslate.translate(schema, Or(AlwaysFalse, good)).isDefined)
    assert(FilterTranslate.translate(schema, Or(good, AlwaysFalse)).isDefined)
    assert(FilterTranslate.translate(schema, Or(AlwaysTrue, good)).isEmpty)
    assert(FilterTranslate.translate(schema, Or(good, AlwaysTrue)).isEmpty)
    // And already kept the translatable side
    assert(FilterTranslate.translate(schema, And(AlwaysTrue, good)).isDefined)
    assert(FilterTranslate.translate(schema, And(good, AlwaysFalse)).isDefined)
  }

  test("startsWith upper bound bumps the last byte and handles 0xff") {
    assert(FilterTranslate.upperBound("ab").map(new String(_)).contains("ac"))
    assert(FilterTranslate.upperBound("aÿ").isDefined) // multi-byte utf8 still bumps
    assert(FilterTranslate.upperBound(new String(Array(0xff.toByte), "ISO-8859-1")).isDefined ||
      FilterTranslate.upperBound("ÿ").isDefined)
  }

  test("partition pruning three-valued logic") {
    val vs = Map[String, Any]("a" -> "x", "b" -> 2, "n" -> null)
    import PartitionPruning.eval3
    assert(eval3(EqualTo("a", "x"), vs).contains(true))
    assert(eval3(EqualTo("a", "y"), vs).contains(false))
    assert(eval3(EqualTo("other", 1), vs).isEmpty) // non-partition col → unknown
    assert(eval3(And(EqualTo("a", "x"), EqualTo("other", 1)), vs).isEmpty)
    assert(eval3(And(EqualTo("a", "y"), EqualTo("other", 1)), vs).contains(false))
    assert(eval3(Or(EqualTo("a", "x"), EqualTo("other", 1)), vs).contains(true))
    assert(eval3(IsNull("n"), vs).contains(true))
    assert(eval3(IsNotNull("n"), vs).contains(false))
    // null comparison → SQL UNKNOWN: definitely passes no rows (collapsed
    // to Some(false)), but Not() must NOT flip it to true (Kleene logic)
    assert(eval3(EqualTo("n", "z"), vs).contains(false))
    assert(eval3(Not(EqualTo("n", "z")), vs).contains(false))
    assert(PartitionPruning.eval4(EqualTo("n", "z"), vs) == PartitionPruning.VUnknown)
    assert(eval3(EqualNullSafe("n", null), vs).contains(true))
    assert(eval3(EqualNullSafe("a", null), vs).contains(false))
    assert(eval3(In("b", Array(1, 2)), vs).contains(true))
    assert(eval3(In("n", Array(1, 2)), vs).contains(false)) // unknown → no rows
    assert(eval3(Not(EqualTo("a", "x")), vs).contains(false))
    // prune only on provable falsehood
    assert(!PartitionPruning.prune(Seq(EqualTo("other", 1)), vs))
    assert(PartitionPruning.prune(Seq(EqualTo("a", "y")), vs))
  }
}
