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
}
