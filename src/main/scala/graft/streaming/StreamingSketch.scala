package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Arrival-time twin of the batch KMV distinct sketch
  * (operators/SketchOps.sketchDistinctKmv): the SAME graft_kmv
  * TypedImperativeAggregate running as a streaming aggregation — the
  * bounded min-k buffer IS the streaming state (≤ k longs per group in
  * the state store, merged per micro-batch exactly as partials merge
  * map-side in batch), so the live distinct-cardinality estimate costs
  * the same bounded memory as the batch one. Complete-mode output; the
  * estimate after all data arrives equals the batch query bit-for-bit
  * (StreamingSpec asserts it), because min-k-distinct is
  * arrival-order-independent.
  */
object StreamingSketch {

  def distinctKmv(events: DataFrame): DataFrame = {
    import graft.operators.SketchOps
    graft.functions.KmvSketchAggregate.ensureRegistered(events.sparkSession)
    events
      .select(col("event_type"), expr(SketchOps.UserHash).as("h"))
      .groupBy("event_type")
      .agg(expr(s"graft_kmv(h, ${SketchOps.KmvK})").as("mins"))
      .select(
        col("event_type"),
        size(col("mins")).cast("long").as("n_kept"),
        expr(SketchOps.kmvEstimateSql("mins")).as("kmv_est"))
  }

  /** Arrival-time twin of the batch rank sketch
    * (operators/SketchOps.sketchQuantileRank): graft_qsketch's bounded
    * bottom-k (hash, value) buffer as streaming state — ≤ k pairs per
    * group in the state store, merged per micro-batch exactly as batch
    * partials merge. The kept set is a pure set function of the data
    * (smallest k distinct pairs), so the live p50/p90/p99 after all
    * data arrives equals the batch query bit-for-bit regardless of
    * arrival order or micro-batch boundaries.
    */
  def quantileRank(events: DataFrame): DataFrame = {
    import graft.operators.SketchOps
    graft.functions.QuantileSketchAggregate.ensureRegistered(events.sparkSession)
    events
      // same guard as the batch twin (ExactSql.ValueFinite): no all-null
      // group may emit an empty kept array (ANSI element_at would throw
      // on it), and non-finite values carry no rank information
      .filter(col("event_id").isNotNull &&
        expr(graft.operators.ExactSql.ValueFinite))
      .select(col("event_type"), expr(SketchOps.EventIdHash).as("h"),
        expr("TRY_CAST(floor(CASE WHEN isnan(value) OR abs(value) >= 9.0e16 THEN NULL ELSE value END * 100 + 0.5) AS BIGINT)").as("v"))
      .groupBy("event_type")
      .agg(expr(s"graft_qsketch(h, v, ${SketchOps.QsK})").as("vs"))
      .select(col("event_type"),
        size(col("vs")).cast("long").as("n_kept"),
        expr(SketchOps.rankSql("vs", 1, 2)).as("p50_e2"),
        expr(SketchOps.rankSql("vs", 9, 10)).as("p90_e2"),
        expr(SketchOps.rankSql("vs", 99, 100)).as("p99_e2"))
  }
}
