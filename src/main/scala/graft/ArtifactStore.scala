package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-session persistence for build-once index artifacts (the
  * decontamination Bloom words, the staged shingle/band-bucket frames, the
  * IVF coarse quantizer). The [[DatasetMemo]] family is per-JVM: at 100 TB
  * these artifacts are hours-long builds, and a driver restart used to
  * throw them away. With `spark.graft.artifacts.dir` set, each artifact is
  * ALSO written as parquet under
  *
  *   `<artifacts.dir>/<artifact name>/<dataset-dir hash>-<fingerprint>/`
  *
  * and a fresh session load-or-builds: fingerprint match ⇒ one parquet
  * read, no recompute; fingerprint miss (in-place dataset rewrite) ⇒
  * normal build, new artifact written beside the stale one. Parquet via
  * the session's Hadoop FS means the same code persists to local disk,
  * HDFS or S3 — wherever the deployment keeps shared state.
  *
  * Unset (the default, and the posture of Verify/Bench so driver timings
  * keep measuring real builds), nothing is read or written and the memos
  * behave exactly as before.
  *
  * Concurrency: writes go to a `.tmp-<applicationId>` sibling and are
  * renamed into place; if another session won the race the temp dir is
  * discarded and the winner's artifact is used. A load that fails for any
  * reason (partial write from a crashed session, schema drift across
  * library versions) degrades to a rebuild — the artifact is a cache,
  * never the source of truth.
  */
object ArtifactStore {

  val DirConfKey = "spark.graft.artifacts.dir"

  /** How one artifact kind round-trips through parquet. `name` is the
    * artifact's directory namespace and must be stable across versions
    * that share a layout. */
  final case class Persistence[V](
      name: String,
      save: (SparkSession, String, V) => Unit,
      load: (SparkSession, String) => V)

  private def root(spark: SparkSession): Option[String] =
    spark.conf.getOption(DirConfKey).filter(_.nonEmpty)

  /** Artifact path for (`name`, dataset `dir`, `fingerprint`) — the dir
    * hash keeps two datasets with coincidentally equal metadata
    * fingerprints apart. */
  private def pathFor(rootDir: String, name: String, dir: String,
                      fingerprint: String): String = {
    val dirHash =
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    s"$rootDir/$name/$dirHash-$fingerprint"
  }

  /** Load the persisted artifact if the store is enabled and a
    * fingerprint-matching one exists; None (never a throw) otherwise. */
  def load[V](spark: SparkSession, p: Persistence[V], dir: String,
              fingerprint: String): Option[V] =
    root(spark).flatMap { r =>
      val path = pathFor(r, p.name, dir, fingerprint)
      // _SUCCESS gates on a COMPLETE write: the rename is atomic, but a
      // crashed pre-rename session leaves only temp dirs, which we never
      // read
      if (new java.io.File(path, "_SUCCESS").exists())
        try Some(p.load(spark, path))
        catch { case scala.util.control.NonFatal(_) => None }
      else None
    }

  /** Persist the artifact (no-op when the store is disabled). Failures are
    * swallowed: the session already holds the in-memory value, and a cache
    * write must never fail the query that built it. */
  def save[V](spark: SparkSession, p: Persistence[V], dir: String,
              fingerprint: String, v: V): Unit =
    root(spark).foreach { r =>
      try {
        val path = pathFor(r, p.name, dir, fingerprint)
        val tmp = s"$path.tmp-${spark.sparkContext.applicationId}"
        p.save(spark, tmp, v)
        val (src, dst) = (new java.io.File(tmp), new java.io.File(path))
        if (!src.renameTo(dst)) {
          // lost the race (or a stale artifact dir exists): keep the
          // incumbent, drop ours
          deleteRecursively(src)
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** A DataFrame artifact: saved as-is, loaded as a plain parquet scan —
    * which doubles as the staging medium, so a loaded artifact needs no
    * re-checkpoint and survives executor loss by construction. */
  def frame(name: String): Persistence[DataFrame] = Persistence(
    name,
    save = (_, path, df) => df.write.mode("overwrite").parquet(path),
    load = (spark, path) => spark.read.parquet(path))

  /** A packed-words artifact (the Bloom filter): order carried by an
    * explicit index column — parquet row order is not a contract. */
  def longArray(name: String): Persistence[Array[Long]] = Persistence(
    name,
    save = (spark, path, words) => {
      import spark.implicits._
      words.toSeq.zipWithIndex.map { case (w, i) => (i, w) }
        .toDF("i", "w").repartition(1).write.mode("overwrite").parquet(path)
    },
    load = (spark, path) => {
      val rows = spark.read.parquet(path).collect()
      val out = new Array[Long](rows.length)
      rows.foreach(r => out(r.getAs[Int]("i")) = r.getAs[Long]("w"))
      out
    })
}
