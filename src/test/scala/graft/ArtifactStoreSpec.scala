package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.operators.{DedupOps, KMeansOps}
import org.apache.spark.sql.functions._

/** Cross-session persistence of build-once index artifacts: with
  * `spark.graft.artifacts.dir` set, a [[DatasetMemo]] with a
  * [[ArtifactStore.Persistence]] writes each built artifact through to
  * parquet, and a FRESH memo (the per-JVM map of a restarted driver)
  * serves the persisted copy without re-running the build — the round-12
  * closure of "the memos are per-JVM; at 100 TB these are hours-long
  * builds a restart throws away".
  */
class ArtifactStoreSpec extends SparkSuite {

  private def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** A scratch dataset dir holding a COPY of the smoke documents table, so
    * fingerprint-invalidation tests can rewrite it without touching the
    * shared testdata. */
  private def scratchDataset(): String = {
    val d = tempDir("graft-artifact-ds")
    for (t <- Seq("documents.parquet", "embeddings.parquet"))
      Files.copy(Paths.get(smokeDir, t), Paths.get(d, t),
        StandardCopyOption.REPLACE_EXISTING)
    d
  }

  private def withStore[T](f: String => T): T = {
    val store = tempDir("graft-artifact-store")
    spark.conf.set(ArtifactStore.DirConfKey, store)
    try f(store)
    finally spark.conf.unset(ArtifactStore.DirConfKey)
  }

  test("a fresh memo loads the persisted frame instead of rebuilding") {
    val ds = scratchDataset()
    withStore { _ =>
      var builds = 0
      def build = {
        builds += 1
        Tables.documents(spark, ds)
          .select(col("doc_id"), length(col("text")).as("len"))
      }
      val p = Some(ArtifactStore.frame("spec_doc_lens"))
      val memo1 = new DatasetMemo[org.apache.spark.sql.DataFrame](p)
      val first = memo1.get(spark, ds, "documents.parquet")(build).collect()
      assert(builds === 1 && first.nonEmpty)
      // same memo, warm hit
      memo1.get(spark, ds, "documents.parquet")(build)
      assert(builds === 1)
      // FRESH memo instance = the per-JVM map after a driver restart:
      // the build closure must NOT run again (the no-recompute assert)
      val memo2 = new DatasetMemo[org.apache.spark.sql.DataFrame](p)
      val reloaded = memo2.get(spark, ds, "documents.parquet")(build).collect()
      assert(builds === 1, "persisted artifact was rebuilt")
      assert(reloaded.map(_.toString).sorted === first.map(_.toString).sorted)
    }
  }

  test("an in-place dataset rewrite invalidates the persisted artifact") {
    val ds = scratchDataset()
    withStore { _ =>
      var builds = 0
      // the build is dataset-independent on purpose: under test here is
      // the fingerprint KEYING, not the artifact content
      def build = { builds += 1; spark.range(5).toDF("doc_id") }
      val p = Some(ArtifactStore.frame("spec_invalidation"))
      new DatasetMemo[org.apache.spark.sql.DataFrame](p)
        .get(spark, ds, "documents.parquet")(build)
      assert(builds === 1)
      // rewrite the table in place (different length ⇒ new fingerprint)
      val docs = Paths.get(ds, "documents.parquet")
      Files.write(docs, Files.readAllBytes(docs) ++ Array[Byte](0))
      new DatasetMemo[org.apache.spark.sql.DataFrame](p)
        .get(spark, ds, "documents.parquet")(build)
      assert(builds === 2, "stale artifact served for a rewritten dataset")
    }
  }

  test("without the conf, nothing is written and memos stay per-JVM") {
    val ds = scratchDataset()
    var builds = 0
    def build = { builds += 1; spark.range(3).toDF() }
    val p = Some(ArtifactStore.frame("spec_disabled"))
    new DatasetMemo[org.apache.spark.sql.DataFrame](p)
      .get(spark, ds, "documents.parquet")(build)
    new DatasetMemo[org.apache.spark.sql.DataFrame](p)
      .get(spark, ds, "documents.parquet")(build)
    assert(builds === 2) // fresh memo had nowhere to load from
  }

  test("long-array artifacts round-trip with order restored by index") {
    val ds = scratchDataset()
    withStore { _ =>
      val words = Array.tabulate(257)(i => i * 2654435761L)
      val p = Some(ArtifactStore.longArray("spec_words"))
      new DatasetMemo[Array[Long]](p).get(spark, ds, "documents.parquet")(words)
      val loaded = new DatasetMemo[Array[Long]](p)
        .get(spark, ds, "documents.parquet") {
          fail("persisted words were rebuilt"): Array[Long]
        }
      assert(loaded.toSeq === words.toSeq)
    }
  }

  test("path ops run through the artifact path's Hadoop FileSystem") {
    // The store claims "local disk, HDFS or S3". Registering a counting
    // FileSystem under a fake countfs:// scheme proves the claim's
    // mechanism: every probe/publish/cleanup resolves the scheme's
    // FileSystem (as parquet read/write do) — a java.io.File fallback
    // (the round-12 fault) would miss every probe and fail every rename.
    val ds = scratchDataset()
    val local = tempDir("graft-countfs-store")
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.countfs.impl", classOf[CountingLocalFs].getName)
    spark.conf.set(ArtifactStore.DirConfKey, s"countfs://$local")
    try {
      CountingLocalFs.reset()
      var builds = 0
      def build = { builds += 1; spark.range(4).toDF("doc_id") }
      val p = Some(ArtifactStore.frame("spec_countfs"))
      new DatasetMemo[org.apache.spark.sql.DataFrame](p)
        .get(spark, ds, "documents.parquet")(build)
      assert(builds === 1)
      // the publish rename reached the countfs FileSystem: the artifact
      // sits on the backing local disk, complete, with no .tmp- leak
      val dirs = Option(new java.io.File(s"$local/spec_countfs/${ArtifactStore.FormatVersion}").listFiles())
        .getOrElse(Array.empty).toSeq
      assert(dirs.count(_.isDirectory) === 1,
        s"expected exactly the published artifact, got $dirs")
      assert(!dirs.head.getName.contains(".tmp-"), "temp dir leaked")
      assert(new java.io.File(dirs.head, "_SUCCESS").exists())
      assert(CountingLocalFs.renameCalls.get() >= 1,
        "publish rename never reached the scheme's FileSystem")
      // a fresh memo must HIT through countfs: probe + load, no rebuild
      val probesBefore = CountingLocalFs.existsCalls.get()
      val reloaded = new DatasetMemo[org.apache.spark.sql.DataFrame](p)
        .get(spark, ds, "documents.parquet")(build)
      assert(builds === 1,
        "fresh memo rebuilt: the _SUCCESS probe missed through countfs")
      assert(reloaded.count() === 4)
      assert(CountingLocalFs.existsCalls.get() > probesBefore,
        "the _SUCCESS probe never reached the scheme's FileSystem")
    } finally {
      spark.conf.unset(ArtifactStore.DirConfKey)
      hconf.unset("fs.countfs.impl")
    }
  }

  test("the race loser keeps the incumbent and leaves no temp dir") {
    val ds = scratchDataset()
    withStore { store =>
      val p = ArtifactStore.frame("spec_race")
      ArtifactStore.save(spark, p, ds, "fixedfp", spark.range(3).toDF("v"))
      // second writer for the same slot = the race loser
      ArtifactStore.save(spark, p, ds, "fixedfp", spark.range(9).toDF("v"))
      assert(ArtifactStore.load(spark, p, ds, "fixedfp").get.count() === 3,
        "incumbent was overwritten by the race loser")
      val dirs = new java.io.File(s"$store/spec_race/${ArtifactStore.FormatVersion}").listFiles().toSeq
      assert(dirs.count(_.isDirectory) === 1, s"temp dir leaked: $dirs")
    }
  }

  test("replace=true swaps the new artifact in with no leftovers") {
    val ds = scratchDataset()
    withStore { store =>
      val p = ArtifactStore.frame("spec_replace")
      ArtifactStore.save(spark, p, ds, "fixedfp", spark.range(2).toDF("v"))
      ArtifactStore.save(spark, p, ds, "fixedfp", spark.range(7).toDF("v"),
        replace = true)
      assert(ArtifactStore.load(spark, p, ds, "fixedfp").get.count() === 7,
        "replace kept the shallow incumbent")
      val dirs = new java.io.File(s"$store/spec_replace/${ArtifactStore.FormatVersion}").listFiles().toSeq
      assert(dirs.count(_.isDirectory) === 1, s"tmp/old dir leaked: $dirs")
    }
  }

  test("replace race: a racer publishing into the vacated slot is kept intact") {
    val ds = scratchDataset()
    val local = tempDir("graft-racefs-store")
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.racefs.impl", classOf[RacingLocalFs].getName)
    spark.conf.set(ArtifactStore.DirConfKey, s"racefs://$local")
    try {
      val p = ArtifactStore.frame("spec_replace_race")
      // incumbent (2 rows) and, in a sibling slot, the racer's complete
      // published artifact (5 rows) used as the plant template
      ArtifactStore.save(spark, p, ds, "racefp", spark.range(2).toDF("v"))
      ArtifactStore.save(spark, p, ds, "racertpl", spark.range(5).toDF("v"))
      val slots = new java.io.File(s"$local/spec_replace_race/${ArtifactStore.FormatVersion}")
      val slotOf: String => java.io.File =
        fp => slots.listFiles().filter(_.getName.endsWith(s"-$fp")).head
      RacingLocalFs.arm(slotOf("racertpl").toString)
      // our replace=true save: the racer plants its artifact the instant
      // the incumbent is moved aside, so our publish must LOSE — and the
      // recovery must keep the racer's artifact, not rename the stale
      // incumbent onto it (Hadoop would nest it inside, poisoning loads)
      ArtifactStore.save(spark, p, ds, "racefp", spark.range(9).toDF("v"),
        replace = true)
      assert(!RacingLocalFs.armed.get(), "the race was never injected")
      assert(ArtifactStore.load(spark, p, ds, "racefp").get.count() === 5,
        "the racer's published artifact was not preserved")
      val nested = slotOf("racefp").listFiles().filter(_.isDirectory).toSeq
      assert(nested.isEmpty, s"stale incumbent nested inside the slot: $nested")
      val leaked = slots.listFiles()
        .filter(d => d.getName.contains(".tmp-") || d.getName.contains(".old-"))
      assert(leaked.isEmpty, s"tmp/old dirs leaked: ${leaked.toSeq}")
    } finally {
      spark.conf.unset(ArtifactStore.DirConfKey)
      hconf.unset("fs.racefs.impl")
    }
  }

  test("replace publish failure with the slot empty restores the incumbent") {
    val ds = scratchDataset()
    withStore { store =>
      val p = ArtifactStore.frame("spec_replace_restore")
      ArtifactStore.save(spark, p, ds, "fp", spark.range(3).toDF("v"))
      // a persistence whose save writes nothing: the publish rename fails
      // (missing source) AFTER the incumbent was moved aside — the swap
      // must put the incumbent back rather than leave the slot empty
      val broken = ArtifactStore.Persistence[org.apache.spark.sql.DataFrame](
        "spec_replace_restore",
        save = (_, _, _) => (),
        load = (s, path) => s.read.parquet(path))
      ArtifactStore.save(spark, broken, ds, "fp", spark.range(9).toDF("v"),
        replace = true)
      assert(ArtifactStore.load(spark, p, ds, "fp").get.count() === 3,
        "incumbent lost: the failed swap did not restore it")
      val dirs = new java.io.File(s"$store/spec_replace_restore/${ArtifactStore.FormatVersion}").listFiles().toSeq
      assert(dirs.count(_.isDirectory) === 1, s"tmp/old dir leaked: $dirs")
    }
  }

  test("publish evicts stale fingerprints down to winner + 1 survivor") {
    val ds = scratchDataset()
    withStore { store =>
      val p = ArtifactStore.frame("spec_evict")
      // three dataset generations = three fingerprints of the same
      // artifact name; pre-eviction this grew without bound
      for ((fp, n) <- Seq(("gen1", 1), ("gen2", 2), ("gen3", 3))) {
        ArtifactStore.save(spark, p, ds, fp, spark.range(n.toLong).toDF("v"))
        Thread.sleep(20) // keep publish mtimes strictly ordered
      }
      val dirs = new java.io.File(s"$store/spec_evict/${ArtifactStore.FormatVersion}")
        .listFiles().filter(_.isDirectory).map(_.getName).toSeq
      assert(dirs.size === 2, s"expected winner + 1 survivor, got $dirs")
      assert(dirs.exists(_.endsWith("-gen3")), s"winner evicted: $dirs")
      assert(dirs.exists(_.endsWith("-gen2")), s"most recent sibling evicted: $dirs")
      // the winner stays loadable; the evicted generation degrades to None
      assert(ArtifactStore.load(spark, p, ds, "gen3").get.count() === 3)
      assert(ArtifactStore.load(spark, p, ds, "gen1").isEmpty)
    }
  }

  test("eviction never touches live sibling VARIANTS of the same name") {
    val ds = scratchDataset()
    withStore { store =>
      val p = ArtifactStore.frame("spec_evict_variants")
      // two live hyperparameter variants + one other-variant generation,
      // all same dataset generation "aaa" except the last publish
      ArtifactStore.save(spark, p, ds, "aaa-k8", spark.range(1).toDF("v"))
      Thread.sleep(20)
      ArtifactStore.save(spark, p, ds, "aaa-k16", spark.range(2).toDF("v"))
      Thread.sleep(20)
      // a new DATA generation of the k8 variant: supersedes aaa-k8 (kept
      // as the 1 stale survivor), never touches the k16 variant
      ArtifactStore.save(spark, p, ds, "bbb-k8", spark.range(3).toDF("v"))
      Thread.sleep(20)
      ArtifactStore.save(spark, p, ds, "ccc-k8", spark.range(4).toDF("v"))
      val dirs = new java.io.File(s"$store/spec_evict_variants/${ArtifactStore.FormatVersion}")
        .listFiles().filter(_.isDirectory).map(_.getName).toSeq.sorted
      // ccc-k8 (winner) + bbb-k8 (1 stale generation) + aaa-k16 (live
      // variant, untouched); aaa-k8 (2 generations old) evicted
      assert(dirs.exists(_.endsWith("-ccc-k8")), s"winner missing: $dirs")
      assert(dirs.exists(_.endsWith("-bbb-k8")), s"stale survivor missing: $dirs")
      assert(dirs.exists(_.endsWith("-aaa-k16")),
        s"live sibling variant was evicted: $dirs")
      assert(!dirs.exists(_.endsWith("-aaa-k8")), s"2-gen-old not evicted: $dirs")
      assert(ArtifactStore.load(spark, p, ds, "aaa-k16").get.count() === 2)
    }
  }

  test("a loaded frame survives eviction of its artifact files (loads are eager)") {
    val ds = scratchDataset()
    withStore { store =>
      val p = ArtifactStore.frame("spec_evict_reader")
      ArtifactStore.save(spark, p, ds, "fp", spark.range(6).toDF("v"))
      val loaded = ArtifactStore.load(spark, p, ds, "fp").get
      // a concurrent publisher evicts the artifact AFTER our load returned
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(s"$store/spec_evict_reader"))
      // the load staged eagerly (Materialize.stageShared fully reads the
      // parquet before load returns), so the frame no longer references
      // the artifact path — consuming it must not throw (ADVICE r18
      // asked whether "degrades to a rebuild" was accurate for a reader
      // holding a returned handle; this pins the stronger property: the
      // handle itself stays valid)
      assert(loaded.count() === 6)
      assert(loaded.agg(sum("v")).head.getLong(0) === 15L)
    }
  }

  test("a failed publish does not inflate the saves counter") {
    val ds = scratchDataset()
    withStore { _ =>
      ArtifactStore.resetStats()
      val p = ArtifactStore.frame("spec_saves_honest")
      ArtifactStore.save(spark, p, ds, "fp", spark.range(2).toDF("v"))
      assert(ArtifactStore.saves.get() === 1)
      // the race loser's publish fails (incumbent holds the slot): saves
      // must stay at 1 — it counts artifacts PUBLISHED, and the
      // BENCH_DETAIL store stamp is built from it (ADVICE r18)
      ArtifactStore.save(spark, p, ds, "fp", spark.range(9).toDF("v"))
      assert(ArtifactStore.saves.get() === 1,
        "race loser inflated the saves counter")
      // a save whose write throws mid-flight must not count either
      val broken = ArtifactStore.Persistence[org.apache.spark.sql.DataFrame](
        "spec_saves_honest_broken",
        save = (_, _, _) => sys.error("disk full"),
        load = (s, path) => s.read.parquet(path))
      ArtifactStore.save(spark, broken, ds, "fp", spark.range(9).toDF("v"))
      assert(ArtifactStore.saves.get() === 1,
        "failed write inflated the saves counter")
    }
  }

  test("store traffic counters: hit, miss, and save are each counted") {
    val ds = scratchDataset()
    withStore { _ =>
      ArtifactStore.resetStats()
      val p = ArtifactStore.frame("spec_stats")
      assert(ArtifactStore.load(spark, p, ds, "fp").isEmpty)
      assert(ArtifactStore.misses.get() === 1 && ArtifactStore.hits.get() === 0)
      ArtifactStore.save(spark, p, ds, "fp", spark.range(2).toDF("v"))
      assert(ArtifactStore.saves.get() === 1)
      assert(ArtifactStore.load(spark, p, ds, "fp").isDefined)
      assert(ArtifactStore.hits.get() === 1 && ArtifactStore.misses.get() === 1)
    }
  }

  test("real call sites write through: bloom words and the IVF model") {
    val ds = scratchDataset()
    withStore { store =>
      val bloom = DedupOps.decontamBloom.run(spark, ds)
      assert(bloom.count() > 0)
      val centroids = KMeansOps.kmeansCentroids.run(spark, ds)
      assert(centroids.count() > 0)
      def artifactDirs(name: String) =
        Option(new java.io.File(s"$store/$name/${ArtifactStore.FormatVersion}").listFiles())
          .getOrElse(Array.empty).filter(_.isDirectory).toSeq
      val bloomDirs = artifactDirs("bloom_words")
      assert(bloomDirs.size === 1, s"bloom artifact missing under $store")
      assert(new java.io.File(bloomDirs.head, "_SUCCESS").exists())
      val modelDirs = artifactDirs("ivf_model")
      assert(modelDirs.size === 1, s"ivf model artifact missing under $store")
      // the persisted model is readable and carries the seed iteration 0
      val model = spark.read.parquet(modelDirs.head.toString)
      assert(model.columns.toSeq === Seq("iter", "cid", "cv", "cnt"))
      assert(model.filter(col("iter") === 0).count() === KMeansOps.K.toLong)
      val shingleDirs = artifactDirs("capped_shingles")
      assert(shingleDirs.size === 1, "capped-shingle artifact missing")
      // and the persisted frame loads back as a usable scan
      assert(spark.read.parquet(shingleDirs.head.toString).count() > 0)
      val scrub = graft.operators.CorpusOps.dedupSpanBoilerplate.run(spark, ds)
      assert(scrub.count() > 0)
      val boilerDirs = artifactDirs("boiler_spans")
      assert(boilerDirs.size === 1, "boiler-span artifact missing")
      assert(new java.io.File(boilerDirs.head, "_SUCCESS").exists())
    }
  }
}
