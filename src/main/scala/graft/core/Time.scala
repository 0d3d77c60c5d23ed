package graft.core

import java.time.Instant

/** Engine-internal virtual time.
  *
  * The reference keeps time as UTC `pd.Timestamp` (int64 nanoseconds;
  * sentinels `UTC_EPOCH`/`UTC_MAX`, reference `beavers/dag.py:46-47`).
  * Spark timestamps are microsecond precision, so the engine keeps its own
  * clock in `Long` nanos and truncates only at DataFrame boundaries
  * (see SURVEY.md §7.4.6).
  */
object Time {
  /** Nanoseconds since the UTC epoch. */
  type Nanos = Long

  /** `UTC_EPOCH` sentinel (reference `beavers/dag.py:46`). */
  val UtcEpoch: Nanos = 0L

  /** `UTC_MAX` sentinel = "no timer" (reference `beavers/dag.py:47`,
    * `pd.Timestamp.max` is the int64-ns max). */
  val UtcMax: Nanos = Long.MaxValue

  def toInstant(n: Nanos): Instant =
    if (n == UtcMax) Instant.ofEpochSecond(UtcMax / 1000000000L, UtcMax % 1000000000L)
    else Instant.ofEpochSecond(Math.floorDiv(n, 1000000000L), Math.floorMod(n, 1000000000L))

  def fromInstant(i: Instant): Nanos =
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000000L), i.getNano.toLong)

  /** Truncate to Spark's microsecond precision (for DataFrame boundaries). */
  def toMicros(n: Nanos): Long = Math.floorDiv(n, 1000L)

  def fromMillis(ms: Long): Nanos = Math.multiplyExact(ms, 1000000L)

  def nanos(i: Instant): Nanos = fromInstant(i)

  def parse(s: String): Nanos = fromInstant(Instant.parse(s))
}
