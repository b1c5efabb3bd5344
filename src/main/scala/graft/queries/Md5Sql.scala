package graft.queries

/** The portable md5-60 hex-recombination SQL fragment —
  * [[graft.ops.Dedup.md5TokenHash60]]'s DuckDB twin, THE one
  * definition every oracle that replays an md5-60 id composes.
  *
  * Deliberately a LEAF object with no other members: the query-wave
  * objects initialize big SQL `val`s that reference each other, and a
  * shared helper living on one of them turns a cross-wave call into an
  * object-initialization cycle (A's vals trigger B's init which reads
  * A's not-yet-assigned vals as null — found the hard way when the
  * round-20 dedup sweep NPE'd the Verify dump). A stateless leaf can
  * be called from any wave's initializer safely. */
object Md5Sql {
  /** Recombine a 15-hex-char column alias into the 60-bit integer. */
  private[queries] def hexValOf(alias: String): String = (0 until 15).map(i =>
    s"(strpos('0123456789abcdef', substring($alias, ${i + 1}, 1)) - 1) * ${1L << (4 * (14 - i))}")
    .mkString(" + ")

  private[queries] def hexVal: String = hexValOf("h15")
}
