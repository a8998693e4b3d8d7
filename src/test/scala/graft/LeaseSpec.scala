package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.StoreOps
import graft.llm.SearchIndex

/** Single-maintainer lease semantics ([[StoreOps.Lease]]): mutators are
  * mutually exclusive per store directory, crashes are recoverable via
  * ttl expiry, and the lease never outlives a successful op. */
class LeaseSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-lease").toString

  private def leaseFile(dir: String) = Paths.get(dir, "_lease")

  test("withLease runs the body and leaves no lease behind") {
    val dir = tmpDir()
    var ran = false
    StoreOps.Lease.withLease(spark, dir) { ran = true }
    assert(ran)
    assert(!Files.exists(leaseFile(dir)))
  }

  test("a second maintainer is refused while the lease is live") {
    val dir = tmpDir()
    @volatile var thrown: Option[Throwable] = None
    StoreOps.Lease.withLease(spark, dir) {
      assert(Files.exists(leaseFile(dir)))
      // another MAINTAINER = another thread (the lease is reentrant only
      // within the holding thread)
      val t = new Thread(() =>
        try StoreOps.Lease.withLease(spark, dir) { fail("must not run") }
        catch { case e: Throwable => thrown = Some(e) })
      t.start(); t.join()
    }
    assert(thrown.exists(_.isInstanceOf[StoreOps.StoreBusyException]),
      s"got $thrown")
    assert(!Files.exists(leaseFile(dir))) // released after the body
  }

  test("reentrant within the holding thread (vacuum-calls-compact shape)") {
    val dir = tmpDir()
    var inner = false
    StoreOps.Lease.withLease(spark, dir) {
      StoreOps.Lease.withLease(spark, dir) { inner = true }
      // the inner exit must NOT have released the outer lease
      assert(Files.exists(leaseFile(dir)))
    }
    assert(inner)
    assert(!Files.exists(leaseFile(dir)))
  }

  test("a crashed holder's expired lease is taken over") {
    val dir = tmpDir()
    val stale = s"dead-holder-token ${System.currentTimeMillis() - 60000}"
    Files.write(leaseFile(dir), stale.getBytes(StandardCharsets.UTF_8))
    var ran = false
    // ttl 1s: the 60s-old lease is expired garbage
    StoreOps.Lease.withLease(spark, dir, ttlMs = 1000L) { ran = true }
    assert(ran)
    assert(!Files.exists(leaseFile(dir)))
  }

  test("a live foreign lease is honored (not taken over) within ttl") {
    val dir = tmpDir()
    val live = s"other-holder-token ${System.currentTimeMillis()}"
    Files.write(leaseFile(dir), live.getBytes(StandardCharsets.UTF_8))
    intercept[StoreOps.StoreBusyException] {
      StoreOps.Lease.withLease(spark, dir) { fail("must not run") }
    }
    // the foreign lease survives the refusal
    assert(new String(Files.readAllBytes(leaseFile(dir)),
      StandardCharsets.UTF_8) == live)
  }

  test("store mutators refuse under a foreign lease; probes don't care") {
    val dir = tmpDir()
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    SearchIndex.build(docs, dir)
    // plant a live foreign lease
    Files.write(leaseFile(dir),
      s"foreign ${System.currentTimeMillis()}".getBytes(StandardCharsets.UTF_8))
    intercept[StoreOps.StoreBusyException] {
      SearchIndex.remove(dir, Seq(1L).toDF("doc_id"))
    }
    intercept[StoreOps.StoreBusyException] { SearchIndex.compact(dir) }
    // reads stay lock-free
    assert(SearchIndex.search(spark, dir,
      Seq((10L, "alpha")).toDF("query_id", "qtext"), 5).count() > 0)
    Files.delete(leaseFile(dir))
    // and with the lease gone, maintenance proceeds
    SearchIndex.compact(dir)
    assert(!Files.exists(leaseFile(dir)))
  }

  test("holder reports the live lease and its age") {
    val dir = tmpDir()
    assert(StoreOps.Lease.holder(spark, dir).isEmpty)
    StoreOps.Lease.withLease(spark, dir) {
      val h = StoreOps.Lease.holder(spark, dir)
      assert(h.isDefined && h.get._2 >= 0L)
    }
    assert(StoreOps.Lease.holder(spark, dir).isEmpty)
  }
}
