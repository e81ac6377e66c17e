package graft

import org.apache.spark.sql.Dataset

/** One policy for staging intermediates that multiple consumers walk
  * (signature corpora, pair sets, iterative labels) instead of bare
  * localCheckpoint calls at every site:
  *
  *  - default: `localCheckpoint()` — executor-storage-pinned, right for
  *    single-node and sf-scale runs;
  *  - `spark.graft.checkpoint.dir` set: reliable `checkpoint()` into that
  *    directory — the 100 TB posture, where executor loss must not trigger
  *    a recompute storm and storage eviction must not fail the job.
  *
  * The plan shape is identical either way; only the materialization medium
  * changes, which is exactly why it belongs behind one switch rather than
  * per-call-site caveats.
  */
object Materialize {

  val DirConfKey = "spark.graft.checkpoint.dir"

  def stage[T](df: Dataset[T]): Dataset[T] = {
    val spark = df.sparkSession
    // Audit-only fault point (graft.tools.RetryAudit): staged intermediates
    // are computed by their own checkpoint job, so a barrier here makes that
    // job's final stage — post-shuffle wherever the staged frame shuffles —
    // fail attempt 0 and re-execute over the written partials.
    val src =
      if (spark.conf.get(Tables.RetryFaultPostShuffleKey, "false") == "true")
        Tables.retryFaultBarrier(df)
      else df
    spark.conf.getOption(DirConfKey) match {
      case Some(dir) =>
        spark.sparkContext.getCheckpointDir match {
          case None => spark.sparkContext.setCheckpointDir(dir)
          // setCheckpointDir appends a random UUID segment and may qualify
          // the scheme, so "already ours" = the configured path is a
          // path-component prefix of the effective one (scheme and trailing
          // slash stripped on both sides — a bare substring test would let
          // "/a" accept "file:/abc/<uuid>"). SparkContext's dir wins once
          // set; a silently-ignored config is worse than a loud one.
          case Some(existing) =>
            def norm(p: String) =
              p.replaceFirst("^file:", "").stripSuffix("/")
            val want = norm(dir)
            val have = norm(existing)
            if (have != want && !have.startsWith(want + "/"))
              throw new IllegalStateException(
                s"$DirConfKey=$dir conflicts with the SparkContext checkpoint " +
                  s"dir already set to $existing; unset one of them")
        }
        src.checkpoint()
      case None =>
        src.localCheckpoint()
    }
  }
}
