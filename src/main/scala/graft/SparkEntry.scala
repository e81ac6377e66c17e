package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in the per-family operator modules; this object is just
  * the registry the driver consumes.
  */
object SparkEntry {

  /** Every declared engine query, grouped by SURVEY §2 family. */
  def all: Seq[GQuery] =
    EventOps.queries ++ RelationalOps.queries ++ TextOps.queries ++
      GameOps.queries ++ FoldOps.queries ++ DedupOps.queries ++
      SimilarityOps.queries ++ MultimodalOps.queries ++ LcgSourceOps.queries ++
      PipelineOps.queries ++ KMeansOps.queries ++ PqOps.queries ++
      CorpusOps.queries ++
      AnalyticsOps.queries ++ SketchOps.queries ++ GraphOps.queries ++
      LayoutOps.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The scoreboard pipeline (SURVEY §3.3): filter → 2-stage agg → top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    EventOps.topkGlobalRank.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline subset for graft.Bench. */
  def benchQueries: Seq[GQuery] = all.filter(_.bench)
}
