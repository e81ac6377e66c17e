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
