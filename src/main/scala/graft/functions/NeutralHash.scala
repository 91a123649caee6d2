package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-neutral 64-bit hashing for the sketch operators (MinHash,
  * SimHash, sign-projection LSH). xxhash64 is Spark-only; these md5-derived
  * slices replay bit-for-bit in other engines — DuckDB's
  * `md5_number_lower(s)` / `md5_number_upper(s)` are exactly the
  * little-endian u64 of digest bytes [8,16) / [0,8) — so every sketch
  * built on them can be verified end-to-end by an external SQL oracle
  * instead of rows-only checks.
  *
  * Cost note: md5 is ~5-10x slower per call than xxhash64. The sketches
  * keep ONE digest per input token (MinHash derives its k slot hashes as
  * `lower + i*upper` — the standard two-hash Carter-Wegman scheme — from a
  * single digest), so the per-row cost stays one md5 regardless of sketch
  * width; replayability is worth that constant.
  */
object NeutralHash {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  @inline private def digest(bytes: Array[Byte]): Array[Byte] = {
    val d = md5.get()
    d.reset()
    d.digest(bytes)
  }

  @inline private def le64(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (d(off + i) & 0xFFL); i -= 1 }
    v
  }

  /** Little-endian u64 of md5 bytes [8,16) — DuckDB `md5_number_lower`.
    * The signed Long carries the same 64-bit pattern; order comparisons
    * must use `java.lang.Long.compareUnsigned`. */
  def lower64(s: UTF8String): Long = le64(digest(s.getBytes), 8)

  /** Little-endian u64 of md5 bytes [0,8) — DuckDB `md5_number_upper`. */
  def upper64(s: UTF8String): Long = le64(digest(s.getBytes), 0)

  /** Both halves from ONE digest (the two-hash base of MinHash slots). */
  def both64(s: UTF8String): (Long, Long) = {
    val d = digest(s.getBytes)
    (le64(d, 8), le64(d, 0))
  }

  /** Driver-side (plane/seed derivation) variants. */
  def lower64(s: String): Long =
    le64(digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 8)

  def upper64(s: String): Long =
    le64(digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 0)

  /** Unsigned decimal rendering, matching DuckDB's `UBIGINT::VARCHAR`. */
  def unsignedString(v: Long): UTF8String =
    UTF8String.fromString(java.lang.Long.toUnsignedString(v))

  /** Column form of [[lower64]]: one inlined static call per row inside
    * whole-stage codegen (StaticInvoke — the [[TextEntropy]] pattern). */
  def lower64Col(s: Column): Column =
    GraftSqlBridge.column(StaticInvoke(
      NeutralHash.getClass,
      LongType,
      "lower64",
      Seq(GraftSqlBridge.expression(s)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = true))

  /** Wrapping Carter–Wegman slot: (lo + j·hi) mod 2⁶⁴ — JVM Long
    * arithmetic wraps by definition, which ANSI-mode Column arithmetic
    * (overflow-checked add/multiply) cannot express. Same derivation as
    * the MinHash slots; replays as
    * `(lo + j*hi) % 18446744073709551616::HUGEINT` on unsigned values. */
  def cwSlot(lo: Long, hi: Long, j: Long): Long = lo + j * hi

  /** Column form of [[cwSlot]]. */
  def cwSlotCol(lo: Column, hi: Column, j: Column): Column =
    GraftSqlBridge.column(StaticInvoke(
      NeutralHash.getClass,
      LongType,
      "cwSlot",
      Seq(GraftSqlBridge.expression(lo), GraftSqlBridge.expression(hi),
        GraftSqlBridge.expression(j)),
      inputTypes = Seq(LongType, LongType, LongType),
      propagateNull = true,
      returnNullable = true))

  /** Column form of [[upper64]] — the second Carter-Wegman base for
    * relational sketches (count–min buckets derive hash j as
    * `lower + j*upper` exactly like MinHash slots). */
  def upper64Col(s: Column): Column =
    GraftSqlBridge.column(StaticInvoke(
      NeutralHash.getClass,
      LongType,
      "upper64",
      Seq(GraftSqlBridge.expression(s)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = true))

  /** Column form of [[unsignedString]] (band-bucket keys concatenate
    * signature slots as DuckDB-replayable unsigned decimal). */
  def unsignedStringCol(v: Column): Column =
    GraftSqlBridge.column(StaticInvoke(
      NeutralHash.getClass,
      StringType,
      "unsignedString",
      Seq(GraftSqlBridge.expression(v)),
      inputTypes = Seq(LongType),
      propagateNull = true,
      returnNullable = true))
}
