package graft.operators

/** SQL fragments shared by Spark expressions AND DuckDB oracles where the
  * two must stay in bit-lockstep — one home per rule instead of hand
  * copies per query (the EventOps.ValueE2Sql pattern, hoisted).
  */
object ExactSql {

  /** The exact-cents summand: identical text parses in both dialects.
    * TRY_CAST, not CAST: a NaN/±Inf double in the value column (a 100 TB
    * log will have some) must degrade to NULL — skipped by every
    * aggregate identically on both engines — instead of killing the
    * whole query with an ANSI overflow (Spark) or a conversion error
    * (DuckDB). The tolerance is not silent: dq_value_domain is the
    * standing monitor that counts non-finite and out-of-domain values
    * per event type, the ingest-validation half of this contract. */
  val ValueE2 = "TRY_CAST(floor(CASE WHEN isnan(value) OR abs(value) >= 9.0e16 THEN NULL ELSE value END * 100 + 0.5) AS BIGINT)"

  /** Row filter for value-quantile inputs: NULL and non-finite values
    * carry no rank information, and left in they diverge the engines
    * (Spark floor saturates NaN→0 / ±Inf→±Long extreme where DuckDB
    * conversion-errors; NULL sort position is NULLS FIRST vs LAST). The
    * 9.0e16 bound is [[ValueE2]]'s representability domain — the same
    * rows ValueE2 nulls are the rows this predicate drops. Identical
    * text parses in both dialects (Spark and DuckDB both have isnan;
    * abs(±Inf) fails the < bound without an isinf spelling). */
  val ValueFinite =
    "(value IS NOT NULL AND NOT isnan(value) AND abs(value) < 9.0e16)"

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
