package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types._

import graft.sources.SchemaRegistry

class SchemaRegistrySpec extends AnyFunSuite {

  // mirrors the reference's test.yml layout (SURVEY.md §1.3)
  private val yaml =
    """test:
      |  row:
      |    row_key: string
      |  generator:
      |    name: graft.functions.DefaultRowKeyGenerator
      |  A:
      |    A_00: string
      |    A_01: int
      |  B:
      |    B_00: long
      |meta:
      |  row:
      |    row_key: string
      |  info:
      |    server: string
      |    seqnumDuringOpen: bigint
      |    serverstartcode: timestamp
      |""".stripMargin

  test("YAML registry parses to StructType with row_key first and cf:qual names") {
    val specs = SchemaRegistry.parseYaml(yaml)
    assert(specs.map(_.name) == Seq("meta", "test"))
    val t = specs.find(_.name == "test").get
    assert(t.schema.fieldNames.head == "row_key")
    assert(t.schema.fieldNames.toSeq ==
      Seq("row_key", "A:A_00", "A:A_01", "B:B_00"))
    assert(t.schema("A:A_01").dataType == IntegerType)
    assert(t.schema("B:B_00").dataType == LongType)
    assert(t.schema("A:A_00").metadata.getString("family") == "A")
    assert(t.schema("A:A_00").metadata.getString("qualifier") == "A_00")
    assert(t.generatorClass.contains("graft.functions.DefaultRowKeyGenerator"))

    val m = specs.find(_.name == "meta").get
    assert(m.schema("info:serverstartcode").dataType == TimestampType)
    assert(m.generatorClass.isEmpty)
  }

  test("type aliases from the reference parser are accepted") {
    assert(SchemaRegistry.parseType("real") == FloatType)
    assert(SchemaRegistry.parseType("timestamp_ntz") == TimestampNTZType)
    assert(SchemaRegistry.parseType("dec") == DecimalType.USER_DEFAULT)
    assert(SchemaRegistry.parseType("decimal(12,3)") == DecimalType(12, 3))
    assert(SchemaRegistry.parseType("varchar(10)") == VarcharType(10))
  }
}
