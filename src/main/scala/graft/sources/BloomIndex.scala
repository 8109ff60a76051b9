package graft.sources

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.sources.{And, EqualNullSafe, EqualTo, Filter, In, Or}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Registry-level per-file Bloom filters — FILE pruning for equality
  * lookups on columns the layout does NOT cluster.
  *
  * The commit-time range registry already skips files for predicates on
  * sorted/clustered columns (min/max disproof) and the parquet writer can
  * embed row-group Blooms (`write.bloom.columns`) that skip row groups
  * once a file is OPEN. What neither covers is the needle-in-a-haystack
  * lookup on an UNCLUSTERED column: every file's [min, max] spans the
  * whole domain, so range disproof never fires and a point lookup reads
  * every file of the table. At 100 TB / 1M files that is 1M file opens
  * to find one row.
  *
  * Opting a column in (`index.bloom.columns` table property) makes every
  * writer fold the column's non-null values into a small per-file Bloom
  * bitset, carried in the file's stats-registry entry — so the DRIVER
  * disproves `col = v` / `col IN (...)` per file from metadata it already
  * holds, before any data I/O: a point lookup plans O(matching + false
  * positive) files at any table size. False positives only cost reads
  * (the pushed filter still applies row-level); false negatives cannot
  * happen — a file is skipped only when NO hash position of the probed
  * value is set.
  *
  * Sizing: `index.bloom.bits` (default 8192 = 1 KB/file/column, k=4
  * double-hashed probes) targets files with bounded per-column
  * cardinality — id-per-commit ingest, batch-clustered layouts
  * (~2k distinct values/file ≈ 15% FPR, ~1k ≈ 2%). For uniformly-random
  * multi-million-row files the per-file bitset saturates and file-level
  * pruning legitimately degrades to the parquet row-group Blooms; the
  * writer therefore DROPS a bloom whose fill ratio exceeds 3/4 (it would
  * prune < ~30% of misses — not worth its registry bytes).
  *
  * Soundness with SQL semantics: Blooms summarize NON-NULL values, and
  * `col = v` / `col IN (...)` never match null rows, so "no non-null
  * value of this file can equal v" justifies skipping the file even when
  * it holds nulls. `<=>` with a non-null literal prunes the same way;
  * `<=> null` and IS NULL never consult the bloom. Values hash on the
  * same EXTERNAL string forms the range registry stores (ISO dates,
  * decimal integers), so an int→long type widening keeps old files'
  * blooms valid and the scan KEEPS consulting them (GraftScan's
  * `bloomStaleWidened` exempts integral-widened columns from the widened
  * exclusion); widening onto a non-integral type (int→double)
  * re-canonicalizes probes ("123" vs "123.0"), so the scan ignores those
  * columns' bitsets and the DDL retires the column from the index
  * property so new files stop paying for dead bitsets. Renamed columns
  * simply miss the lookup (no pruning — safe), and a column absent from
  * an entry's bloom map is never pruned (pre-index files, ADD COLUMN
  * defaults).
  *
  * Capability ancestor in the reference: per-family `BLOOMFILTER`
  * knob handed to HBase at DDL time (`HBaseClientImpl.scala:303-365`) —
  * there it gates server-side get/scan I/O; here the same declaration
  * gates driver-side file planning, which is the lever that exists in a
  * file-table world.
  */
object BloomIndex {

  /** Comma-separated data columns to index (table property). */
  val ColumnsProp = "index.bloom.columns"
  /** Bits per file per column (table property); clamped to [512, 1 << 20]. */
  val BitsProp = "index.bloom.bits"
  val DefaultBits = 8192
  /** Hash probes per value (double hashing). */
  val K = 4
  /** A bloom with more than this fraction of bits set is dropped by the
    * writer — saturated bitsets prune too little to pay for. */
  val MaxFill = 0.75

  def columnsOf(props: Map[String, String]): Seq[String] =
    props.get(ColumnsProp).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  def bitsOf(props: Map[String, String]): Int = {
    val raw = props.get(BitsProp).map(_.trim.toInt).getOrElse(DefaultBits)
    math.max(512, math.min(1 << 20, raw))
  }

  /** Types whose external string form is canonical on BOTH sides (the
    * writer sees catalyst values, the scan sees external filter values):
    * integrals print as decimal, dates as ISO, strings as themselves.
    * Float/double (NaN, -0.0) and binary stay out. */
  def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType | DateType => true
    case _ => false
  }

  /** Canonical string of a non-null CATALYST value (writer side). */
  def canonicalCatalyst(dt: DataType, v: Any): String = dt match {
    case DateType => java.time.LocalDate.ofEpochDay(
      v.asInstanceOf[Number].longValue()).toString
    case StringType => v.asInstanceOf[UTF8String].toString
    case _ => String.valueOf(v)
  }

  /** Canonical string of a non-null EXTERNAL filter value (scan side):
    * `java.sql.Date`/`LocalDate` print ISO, boxed integrals decimal —
    * the same strings [[canonicalCatalyst]] produced at write time. */
  def canonicalExternal(v: Any): String = String.valueOf(v)

  private def positions(s: String, bits: Int): Array[Int] = {
    val h1 = MurmurHash3.stringHash(s, 0x9747b28c)
    val h2 = MurmurHash3.stringHash(s, 0x1b873593)
    Array.tabulate(K)(i => math.floorMod(h1 + i * h2, bits))
  }

  /** One column's per-file bitset under construction (writer side).
    * Byte-indexed exactly like [[mightContain]] reads it back:
    * bit p lives at `bytes(p >> 3) & (1 << (p & 7))`. */
  final class Builder(bits: Int) {
    private val bytes = new Array[Byte]((bits + 7) / 8)
    def add(canonical: String): Unit =
      positions(canonical, bytes.length * 8).foreach(p =>
        bytes(p >> 3) = (bytes(p >> 3) | (1 << (p & 7))).toByte)
    def fillRatio: Double =
      bytes.map(b => java.lang.Integer.bitCount(b & 0xff).toLong).sum
        .toDouble / (bytes.length * 8)
    /** Registry payload, or None when saturated past [[MaxFill]]. An
      * all-zero bitset (all-null column) compresses to the empty string —
      * "no non-null value exists" in zero bytes. */
    def serialize: Option[String] =
      if (bytes.forall(_ == 0)) Some("")
      else if (fillRatio > MaxFill) None
      else Some(java.util.Base64.getEncoder.encodeToString(bytes))
  }

  /** True when every non-null value of `values` is provably absent from
    * the bitset — the payload is decoded ONCE for the whole list (an
    * IN-list probes up to 4096 values per file; per-value decodes would
    * make driver planning O(files × values) base64 work). A null-only
    * list matches no row under three-valued logic, so it is trivially
    * absent. Malformed payloads answer "might contain" — never a wrong
    * skip. */
  private def allAbsent(b64: String, values: Iterable[Any]): Boolean = {
    val nonNull = values.iterator.filter(_ != null)
    if (nonNull.isEmpty) return true
    try {
      val bytes = java.util.Base64.getDecoder.decode(b64)
      if (bytes.length == 0) return true // all-null column: no non-null value
      val bits = bytes.length * 8
      nonNull.forall { v =>
        !positions(canonicalExternal(v), bits).forall { p =>
          (bytes(p >> 3) & (1 << (p & 7))) != 0
        }
      }
    } catch { case _: IllegalArgumentException => false }
  }

  /** Membership probe against a serialized bitset (bit count is implied
    * by the payload length). */
  def mightContain(b64: String, canonical: String): Boolean =
    !allAbsent(b64, Seq(canonical))

  /** True when `f` PROVES the file holds no matching row, from the
    * entry's bloom map alone (mirrors [[PartitionPruning.rangeDisproves]]'s
    * conservative shape: anything unknown returns false). */
  def disproves(f: Filter, blooms: Map[String, String]): Boolean = f match {
    case EqualTo(a, v) if v != null =>
      blooms.get(a).exists(allAbsent(_, Seq(v)))
    case EqualNullSafe(a, v) if v != null =>
      blooms.get(a).exists(allAbsent(_, Seq(v)))
    case In(a, vs) if vs.nonEmpty =>
      // null never matches IN; a file is skippable when every non-null
      // probe value is provably absent
      blooms.get(a).exists(allAbsent(_, vs))
    case And(l, r) => disproves(l, blooms) || disproves(r, blooms)
    case Or(l, r) => disproves(l, blooms) && disproves(r, blooms)
    case _ => false
  }
}
