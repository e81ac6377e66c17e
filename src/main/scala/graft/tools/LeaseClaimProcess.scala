package graft.tools

/** Child-process body for the CROSS-PROCESS lease race (LeaseSpec): each
  * instance is a separate JVM — a separate OS process, like the
  * reference's independent game clients racing one exclusive Pulsar
  * subscription (pulsar.go:142-152, 198-227) — that claims one shared
  * lease directory. In-JVM thread races exercise the same code but are
  * arbitrated by the JVM's own memory model; ONLY separate processes
  * prove the claim primitive is kernel-arbitrated (NIO CREATE_NEW on the
  * file scheme / namenode-arbitrated create on HDFS).
  *
  * Protocol (argv): `root name owner ttlMs mode`
  *   - all claimants spin-wait for `<root>/go` so N slow-starting JVMs
  *     hit `tryAcquire` inside the same few-millisecond window;
  *   - prints exactly one line: `WON <epoch>` or `LOST`;
  *   - mode `hold`: after WON, sleep forever — the parent `kill -9`s this
  *     process to simulate a crashed owner (no release, no heartbeat;
  *     ownership must lapse by TTL and the next claimant must fence
  *     ABOVE the dead epoch);
  *   - mode `claim`: exit immediately after printing.
  */
object LeaseClaimProcess {
  def main(args: Array[String]): Unit = {
    val Array(root, name, owner, ttlMs, mode) = args.take(5)
    val lease = new graft.streaming.FsLease(root, name, owner, ttlMs.toLong,
      new org.apache.hadoop.conf.Configuration())
    val go = java.nio.file.Paths.get(root, "go")
    val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(go) && System.nanoTime() < deadline)
      Thread.sleep(1)
    lease.tryAcquire() match {
      case Some(e) =>
        println(s"WON $e")
        Console.out.flush()
        if (mode == "hold") while (true) Thread.sleep(1000)
      case None =>
        println("LOST")
        Console.out.flush()
    }
  }
}
