package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types.DateType

import graft.sources.PartField

/** Directory-token round-trips for the hidden time-unit partition fields —
  * including NEGATIVE unit ordinals (proleptic years <= 0, pre-1970
  * hours/days), which truncating `/`/`%` arithmetic used to render as
  * unparseable tokens that bricked every later scan of the table. */
class PartFieldSpec extends AnyFunSuite {

  test("months(): unit ordinals round-trip render/parseRaw, negatives included") {
    val m = PartField.Months("ts")
    for (unit <- Seq(-25L, -13L, -12L, -5L, -1L, 0L, 1L, 11L, 12L, 23651L)) {
      val tok = m.render(unit)
      assert(m.parseRaw(tok) == unit, s"unit $unit rendered '$tok'")
      // the month component stays in [1, 12] so the token is scannable
      val month = tok.substring(tok.lastIndexOf('-') + 1).toInt
      assert(month >= 1 && month <= 12, s"unit $unit rendered month $month")
    }
    assert(m.render(null) == graft.sources.PartitionPruning.NullToken)
    // a proleptic BCE date routes to an ordinal that round-trips too
    val unit = m.floorOf(DateType, java.time.LocalDate.of(-1, 8, 15))
    assert(m.parseRaw(m.render(unit)) == unit)
  }

  test("days() and hours() round-trip negative ordinals") {
    val d = PartField.Days("ts")
    for (unit <- Seq(-400L, -1L, 0L, 1L, 20000L))
      assert(d.parseRaw(d.render(unit)) == unit)
    val h = PartField.Hours("ts")
    for (unit <- Seq(-49L, -24L, -1L, 0L, 1L, 23L, 24L, 480000L))
      assert(h.parseRaw(h.render(unit)) == unit)
  }
}
