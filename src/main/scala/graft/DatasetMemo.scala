package graft

/** Fingerprint-keyed per-dataset memo for build-once index artifacts (the
  * decontamination Bloom words and the staged capped-shingle frame; the
  * IVF model keeps its own variant because its value EXTENDS per call —
  * iterations accumulate — rather than building once). One home for the
  * locking + eviction policy the call sites used to copy by hand:
  *
  *  - the BUILD runs OUTSIDE the lock: it is typically a distributed
  *    Spark job, and holding the JVM monitor across it would serialize
  *    every unrelated query that touches any memo on the same object.
  *    Concurrent cold builds of the same key race benignly — both compute,
  *    the first insert wins, the loser's value is dropped (and for staged
  *    frames the dropped reference is reclaimed by the ContextCleaner);
  *  - eviction on insert drops (a) superseded fingerprints for the same
  *    dir — an in-place dataset rewrite both invalidates (new fingerprint
  *    ⇒ cache miss) and garbage-collects (old entry removed) in one
  *    step — and (b) every entry from a DIFFERENT applicationId: an
  *    artifact built by a stopped SparkSession is never reusable (staged
  *    frames pin blocks of a dead SparkContext), so keeping it would leak
  *    for the JVM's lifetime in any process that restarts sessions (test
  *    suites, long-lived drivers). A live application therefore holds at
  *    most one artifact per dataset dir, all its own.
  */
final class DatasetMemo[V] {

  private val entries =
    scala.collection.mutable.Map.empty[(String, String, String), V]

  /** The memoized artifact for `table` under `dir`, building it on first
    * use (or after an in-place rewrite changed the fingerprint). */
  def get(spark: org.apache.spark.sql.SparkSession, dir: String,
          table: String)(build: => V): V = {
    val key =
      (spark.sparkContext.applicationId, dir, DatasetFingerprint.of(dir, table))
    synchronized(entries.get(key)) match {
      case Some(v) => v
      case None =>
        val built = build // outside the lock — may run Spark jobs
        synchronized {
          entries.keys
            .filter(k => (k._1 != key._1 || k._2 == key._2) && k != key)
            .toSeq.foreach(entries.remove)
          entries.getOrElseUpdate(key, built)
        }
    }
  }
}
