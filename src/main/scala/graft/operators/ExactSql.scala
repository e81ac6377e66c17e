package graft.operators

/** SQL fragments shared by Spark expressions AND DuckDB oracles where the
  * two must stay in bit-lockstep — one home per rule instead of hand
  * copies per query (the EventOps.ValueE2Sql pattern, hoisted).
  */
object ExactSql {

  /** The exact-cents summand: identical text parses in both dialects. */
  val ValueE2 = "CAST(floor(value * 100 + 0.5) AS BIGINT)"

  /** Event-time epoch seconds with FLOOR semantics on both engines.
    * Spark's unix_timestamp family truncates toward zero while DuckDB's
    * floor(epoch(...)) floors — divergent for pre-epoch fractional
    * timestamps (verified: 1969-12-31 23:59:59.5 → 0 vs −1). Truncating
    * to the whole second FIRST (date_trunc, calendar semantics — always
    * toward earlier time on both engines) makes the epoch value an exact
    * integer, where truncate and floor agree. */
  val TsSecSpark = "unix_timestamp(date_trunc('second', ts))"
  val TsSecDuck = "CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT)"

  /** The same floor-safe epoch-seconds pair for an arbitrary timestamp
    * column/expression (scd2's next_ts, session_window bounds — anywhere
    * a fractional pre-epoch value would split truncate-vs-floor). */
  def tsSecSpark(c: String): String = s"unix_timestamp(date_trunc('second', $c))"
  def tsSecDuck(c: String): String =
    s"CAST(floor(epoch(date_trunc('second', $c))) AS BIGINT)"

  /** Event-time hour bucket, same floor-safety argument: the truncated
    * hour's epoch is exactly divisible by 3600, so the integer division
    * is exact and sign-safe on both engines. */
  val HourSpark = "(unix_timestamp(date_trunc('hour', ts)) div 3600)"
  val HourDuck = "(CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600)"
}
