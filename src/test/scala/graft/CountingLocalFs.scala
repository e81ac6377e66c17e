package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A local-disk FileSystem registered under the fake `countfs://` scheme,
  * counting every exists/rename/delete. [[ArtifactStoreSpec]] points
  * `spark.graft.artifacts.dir` at a `countfs://` path: if any
  * ArtifactStore path operation bypassed the Hadoop FileSystem API (the
  * round-12 fault — `java.io.File.exists`/`renameTo` against a string
  * that happens to be a URI), the probe would always miss and the publish
  * would always fail, so the spec's no-rebuild and no-leaked-tmp asserts
  * fail. The counters additionally pin that the calls really arrive HERE,
  * at the scheme's FileSystem, not at some default. */
class CountingLocalFs extends RawLocalFileSystem {
  override def getScheme: String = "countfs"
  override def getUri: URI = URI.create("countfs:///")

  override def exists(p: Path): Boolean = {
    CountingLocalFs.existsCalls.incrementAndGet()
    super.exists(p)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    CountingLocalFs.renameCalls.incrementAndGet()
    super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    CountingLocalFs.deleteCalls.incrementAndGet()
    super.delete(p, recursive)
  }
}

object CountingLocalFs {
  val existsCalls = new AtomicInteger(0)
  val renameCalls = new AtomicInteger(0)
  val deleteCalls = new AtomicInteger(0)

  def reset(): Unit = {
    existsCalls.set(0); renameCalls.set(0); deleteCalls.set(0)
  }
}

/** Deterministic race injection for the replace=true swap, registered
  * under `racefs://`: when armed, the FIRST move-aside rename (the one
  * whose destination carries the `.old-` marker) succeeds and is
  * immediately followed — still inside the rename call, i.e. strictly
  * between the move-aside and the caller's publish — by a racer
  * planting a complete published artifact into the just-vacated slot.
  * This is the exact interleaving where the pre-fix recovery renamed the
  * stale incumbent ONTO the racer's directory, which Hadoop nests inside
  * it, poisoning every future load of that artifact. */
class RacingLocalFs extends RawLocalFileSystem {
  override def getScheme: String = "racefs"
  override def getUri: URI = URI.create("racefs:///")

  override def rename(src: Path, dst: Path): Boolean = {
    val moved = super.rename(src, dst)
    if (moved && dst.getName.contains(".old-") &&
        RacingLocalFs.armed.compareAndSet(true, false)) {
      org.apache.hadoop.fs.FileUtil.copy(
        this, new Path(RacingLocalFs.template), this, src,
        false, getConf)
    }
    moved
  }
}

object RacingLocalFs {
  val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile var template: String = ""

  /** Plant a copy of `templateDir` into the next vacated slot. */
  def arm(templateDir: String): Unit = {
    template = templateDir
    armed.set(true)
  }
}
