package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch

import graft.operators.{ConcurrentWriterException, CosineDedupIndex, DedupPipeline, WriterLease}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-writer discipline on index roots: one writer proceeds, any
  * second writer — another thread here, another process simulated by a
  * foreign lease file — refuses loudly with no state loss. The refusal
  * asserts double as the mutation check: removing the lease acquisition
  * from the entry points makes the interceptions fail. */
class WriterLeaseSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def vecs: DataFrame =
    Tables.embeddings(spark, dir).select("vec_id", "embedding")
  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def plantForeignLease(root: String): java.nio.file.Path = {
    val p = Paths.get(root, WriterLease.fileName)
    Files.createDirectories(Paths.get(root))
    Files.write(p, "pid999@elsewhere/deadbeef\n".getBytes("UTF-8"))
    p
  }

  test("a foreign writer's fresh lease refuses every mutating entry; no state loss") {
    val root = Files.createTempDirectory("graft_wl_foreign").toString
    CosineDedupIndex.ingest(spark, root, vecs.where(col("vec_id") < 100),
      batchKey = Some("b1"))
    CacheJanitor.drain()
    val before = CosineDedupIndex.health(spark, root)

    val lease = plantForeignLease(root)
    val e = intercept[ConcurrentWriterException] {
      CosineDedupIndex.ingest(spark, root, vecs.where(col("vec_id") >= 100),
        batchKey = Some("b2"))
    }
    assert(e.getMessage.contains("pid999@elsewhere"), e.getMessage)
    intercept[ConcurrentWriterException] {
      CosineDedupIndex.remove(spark, root, Seq(3L))
    }
    intercept[ConcurrentWriterException] { CosineDedupIndex.compact(spark, root) }
    intercept[ConcurrentWriterException] { CosineDedupIndex.refreeze(spark, root) }
    intercept[ConcurrentWriterException] { CosineDedupIndex.maintain(spark, root) }
    CacheJanitor.drain()

    // Reads never lease; state is untouched by the refusals.
    assert(CosineDedupIndex.health(spark, root) == before,
      "refused writers must leave the root byte-identical")

    // The foreign writer releases; the next mutation proceeds.
    Files.delete(lease)
    CosineDedupIndex.ingest(spark, root, vecs.where(col("vec_id") >= 100),
      batchKey = Some("b2"))
    CacheJanitor.drain()
    assert(CosineDedupIndex.health(spark, root).live == 500)
    assert(!Files.exists(lease), "the lease must not outlive its mutation")
  }

  test("a stale lease (crashed holder) is broken, loudly, and the writer proceeds") {
    val root = Files.createTempDirectory("graft_wl_stale").toString
    CosineDedupIndex.ingest(spark, root, vecs.where(col("vec_id") < 100),
      batchKey = Some("b1"))
    CacheJanitor.drain()
    val lease = plantForeignLease(root)
    // Backdate past the TTL: the holder is presumed crashed.
    Files.setLastModifiedTime(lease, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - WriterLease.defaultTtlMs - 60_000L))
    CosineDedupIndex.remove(spark, root, Seq(3L))
    CacheJanitor.drain()
    assert(CosineDedupIndex.health(spark, root).tombstoned == 1,
      "the writer must steal a stale lease and complete")
    assert(!Files.exists(lease))
  }

  test("two threads in one process: the second refuses while the first holds, then proceeds") {
    val root = Files.createTempDirectory("graft_wl_threads").toString
    val acquired = new CountDownLatch(1)
    val releaseIt = new CountDownLatch(1)
    val holder = new Thread(() =>
      WriterLease.withLease(spark, root) {
        acquired.countDown()
        releaseIt.await()
      })
    holder.start()
    acquired.await()
    try {
      val e = intercept[ConcurrentWriterException] {
        CosineDedupIndex.ingest(spark, root, vecs.where(col("vec_id") < 100),
          batchKey = Some("b1"))
      }
      assert(e.getMessage.contains("single-writer"), e.getMessage)
    } finally {
      releaseIt.countDown()
      holder.join()
    }
    CacheJanitor.drain()
    // Holder released: same mutation now proceeds.
    CosineDedupIndex.ingest(spark, root, vecs.where(col("vec_id") < 100),
      batchKey = Some("b1"))
    CacheJanitor.drain()
    assert(CosineDedupIndex.health(spark, root).live == 100)
  }

  test("the heartbeat keeps a LIVE holder's lease fresh past the TTL (no mid-action steal)") {
    // A single action outrunning the TTL (a 100 TB refreeze, say) must
    // not age into the steal window while its holder is alive. Hold a
    // lease with a small TTL for longer than that TTL and pin that the
    // lease file's mtime keeps advancing — the staleness clock every
    // would-be stealer consults. Removing the heartbeat fails this
    // (mtime stays at creation, age > ttl).
    val root = Files.createTempDirectory("graft_wl_heartbeat").toString
    val ttl = 2100L // heartbeat interval = ttl / 3 = 700 ms
    val stillHeld = new CountDownLatch(1)
    val mayExit = new CountDownLatch(1)
    val holder = new Thread(() =>
      WriterLease.withLease(spark, root, ttlMs = ttl) {
        Thread.sleep(3 * ttl)
        stillHeld.countDown()
        mayExit.await()
      })
    holder.start()
    stillHeld.await()
    // Still held (inside the body): the lease must look FRESH, i.e.
    // younger than the TTL despite 3×ttl of wall-time since creation.
    // (Local-FS mtime can truncate to whole seconds — the 700 ms beat
    // plus ≤1 s truncation stays well under the 2.1 s TTL.)
    val lease = Paths.get(root, WriterLease.fileName)
    val age = System.currentTimeMillis() - Files.getLastModifiedTime(lease).toMillis
    mayExit.countDown()
    holder.join()
    assert(age >= 0 && age <= ttl,
      s"a live holder's lease aged $age ms past its last heartbeat (ttl $ttl)")
    assert(!Files.exists(lease), "released on exit as always")
  }

  test("the heartbeat survives a non-IO setTimes failure (object-store FS impls)") {
    // Some object-store FileSystem impls throw UnsupportedOperationException
    // from setTimes. That must not KILL the daemon thread — a dead beat
    // silently re-opens the mid-action steal window — it must log and
    // keep looping (worst case the lease ages out, exactly the pre-
    // heartbeat behavior), and still exit promptly on release interrupt.
    val root = Files.createTempDirectory("graft_wl_hb_nonio").toString
    val lease = Paths.get(root, "lease"); Files.write(lease, "x".getBytes)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val fs = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def setTimes(p: org.apache.hadoop.fs.Path, m: Long, a: Long): Unit = {
        calls.incrementAndGet()
        throw new UnsupportedOperationException("setTimes unsupported on this store")
      }
    }
    fs.initialize(new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val t = operators.WriterLease.startHeartbeat(fs,
      new org.apache.hadoop.fs.Path(lease.toString), 150L) // 50 ms beats
    try {
      val deadline = System.currentTimeMillis() + 5000L
      while (calls.get() < 3 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(calls.get() >= 3, "the beat must keep looping through non-IO failures")
      assert(t.isAlive, "a setTimes failure must never kill the heartbeat thread")
    } finally { t.interrupt(); t.join(2000) }
    assert(!t.isAlive, "the beat must exit on release interrupt")
  }

  test("a socket timeout (an InterruptedIOException SUBCLASS) does not kill the beat") {
    // java.net.SocketTimeoutException extends InterruptedIOException but
    // is a transient network failure, not the release interrupt — on a
    // flaky object-store link the beat must log and keep looping, or a
    // single timeout silently re-opens the mid-action steal window.
    val root = Files.createTempDirectory("graft_wl_hb_sockto").toString
    val lease = Paths.get(root, "lease"); Files.write(lease, "x".getBytes)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val fs = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def setTimes(p: org.apache.hadoop.fs.Path, m: Long, a: Long): Unit = {
        calls.incrementAndGet()
        throw new java.net.SocketTimeoutException("read timed out")
      }
    }
    fs.initialize(new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val t = operators.WriterLease.startHeartbeat(fs,
      new org.apache.hadoop.fs.Path(lease.toString), 150L)
    try {
      val deadline = System.currentTimeMillis() + 5000L
      while (calls.get() < 3 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(calls.get() >= 3 && t.isAlive,
        "a socket timeout must never kill the heartbeat thread")
    } finally { t.interrupt(); t.join(2000) }
    assert(!t.isAlive, "the beat must still exit on release interrupt")
  }

  test("an interrupt surfacing as InterruptedIOException exits the beat (no zombie)") {
    // The release interrupt can land INSIDE fs.setTimes and surface as an
    // InterruptedIOException — which CLEARS the thread's interrupt flag.
    // A beat that swallows it as a generic IO failure loops forever after
    // join(1000) gives up: a zombie that keeps touching the lease path,
    // refreshing any LATER crashed holder's lease file at the same path.
    val root = Files.createTempDirectory("graft_wl_hb_intr").toString
    val lease = Paths.get(root, "lease"); Files.write(lease, "x".getBytes)
    val entered = new CountDownLatch(1)
    val fs = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def setTimes(p: org.apache.hadoop.fs.Path, m: Long, a: Long): Unit = {
        entered.countDown()
        try Thread.sleep(60_000) // park until the release interrupt lands here
        catch { case _: InterruptedException =>
          throw new java.io.InterruptedIOException("interrupted in setTimes")
        }
      }
    }
    fs.initialize(new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val t = operators.WriterLease.startHeartbeat(fs,
      new org.apache.hadoop.fs.Path(lease.toString), 150L)
    entered.await()
    t.interrupt()
    t.join(5000)
    assert(!t.isAlive,
      "an interrupt consumed by InterruptedIOException must still exit the beat")
  }

  test("hostile FS: fresh foreign lease refuses, stale foreign lease is stolen (object-store semantics)") {
    // The lease file protocol on the copy+delete, strict-rename store:
    // create-no-overwrite still arbitrates, mtime staleness still reads.
    graft.testfs.HostileFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val local = Files.createTempDirectory("graft_wl_hostile")
    val root = s"hostile://$local"
    val leaseLocal = local.resolve(WriterLease.fileName)
    Files.write(leaseLocal, "pid999@elsewhere/deadbeef\n".getBytes("UTF-8"))
    val e = intercept[ConcurrentWriterException] {
      WriterLease.withLease(spark, root) { fail("must not run under a held lease") }
    }
    assert(e.getMessage.contains("pid999@elsewhere"), e.getMessage)
    // Backdate past the TTL: presumed crashed, stolen, body runs.
    Files.setLastModifiedTime(leaseLocal, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - WriterLease.defaultTtlMs - 60_000L))
    var ran = false
    WriterLease.withLease(spark, root) { ran = true }
    assert(ran, "a stale hostile lease must be stolen")
    assert(!Files.exists(leaseLocal), "released (deleted) on exit")
  }

  test("hostile FS with setTimes denied: the beat survives, keeps trying, and the steal window is the documented degradation") {
    // Object stores without mtime mutation (setTimes throws
    // UnsupportedOperationException): the heartbeat must keep looping
    // loudly — a dead beat would be silent — and the OBSERVABLE
    // degradation is that the lease file's mtime never advances, so a
    // holder outrunning the TTL ages into the steal window (size the
    // TTL to the action on such stores; documented in SCALE.md).
    graft.testfs.HostileFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val local = Files.createTempDirectory("graft_wl_hostile_deny")
    val lease = local.resolve("lease")
    Files.write(lease, "x".getBytes("UTF-8"))
    val m0 = Files.getLastModifiedTime(lease).toMillis
    graft.testfs.HostileFileSystem.denySetTimes(true)
    try {
      graft.testfs.HostileFileSystem.reset()
      val fs = new org.apache.hadoop.fs.Path(s"hostile://$local")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val t = operators.WriterLease.startHeartbeat(fs,
        new org.apache.hadoop.fs.Path(s"hostile://$lease"), 150L) // 50 ms beats
      try {
        val deadline = System.currentTimeMillis() + 5000L
        def beats = graft.testfs.HostileFileSystem.counts.getOrElse("setTimes", 0L)
        while (beats < 3 && System.currentTimeMillis() < deadline) Thread.sleep(20)
        assert(beats >= 3, "the beat must keep TRYING through denied setTimes")
        assert(t.isAlive, "denied setTimes must never kill the heartbeat thread")
        assert(Files.getLastModifiedTime(lease).toMillis == m0,
          "with setTimes denied the mtime cannot advance — the documented steal window")
      } finally { t.interrupt(); t.join(2000) }
      assert(!t.isAlive, "the beat must exit on release interrupt")
    } finally graft.testfs.HostileFileSystem.denySetTimes(false)
  }

  test("composed entries are reentrant: one lease spans runOnce and maintainOnce") {
    // DedupPipeline.runOnce nests SignatureIndex.ingest + ClusterLabels
    // .merge under the same root — all three lease it; reentrancy makes
    // that one acquisition. A non-reentrant design would deadlock or
    // self-refuse here.
    val root = Files.createTempDirectory("graft_wl_reentrant").toString
    val s = DedupPipeline.runOnce(spark, root,
      docs(1L -> "alpha beta gamma delta epsilon zeta eta theta",
           2L -> "alpha beta gamma delta epsilon zeta eta theta",
           3L -> "completely different text with its own words here"),
      batchKey = Some("b1"))
    assert(s.newDocs == 3 && s.deltaPairs >= 1, s)
    val m = DedupPipeline.maintainOnce(spark, root)
    assert(m.before.liveDocs == 3, m)
    assert(!Files.exists(Paths.get(root, WriterLease.fileName)),
      "the lease must be released after each composed entry")
  }
}
