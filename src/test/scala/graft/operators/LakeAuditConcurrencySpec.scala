package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Optimistic-concurrency commit for the WAP publish log (VERDICT r18
  * item 1): the lake's biggest unstated assumption was single-writer —
  * every mutation appended `last.seq + 1` with no conflict check, so two
  * racing publishers could both win a seq. The CAS protocol (entry file
  * NAMED by seq, created atomically-exclusively; loser re-reads the tail
  * and retries) must make every interleaving safe: exactly one winner
  * per seq, no entry lost, no batch logged twice. */
class LakeAuditConcurrencySpec extends SparkSpec {
  import spark.implicits._
  import LakeAudit._

  private val rules = Seq(Rule("id_not_null", col("id").isNotNull))

  test("raw log CAS under heavy thread contention: seqs are unique, contiguous, and nothing is lost") {
    val dir = tmpDir("caslog")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nThreads = 8
    val perThread = 40
    // a start barrier maximizes genuine tail collisions: every thread's
    // first commit proposes seq 1 simultaneously
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val fails = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val won = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    (0 until nThreads).foreach { t =>
      pool.execute { () =>
        try {
          gate.await()
          for (i <- 0 until perThread) {
            val e = LakeAudit.commitEntry(fs, dir, s"t$t-b$i")
            // the CAS contract: the seq this writer believes it won is
            // globally unique — a duplicate here IS the r18 bug
            assert(won.add(e.seq), s"seq ${e.seq} won twice")
          }
        } catch { case th: Throwable => fails.compareAndSet(null, th) }
      }
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
    if (fails.get() != null) throw fails.get()
    val log = publishLog(spark, dir)
    val n = nThreads * perThread
    assert(log.map(_.seq) == (1L to n.toLong),
      s"log seqs must be exactly 1..$n contiguous")
    assert(log.map(_.batchId).distinct.size == n,
      "every batchId appears exactly once")
    // replayed commit of an existing batchId returns its ORIGINAL entry
    val replay = LakeAudit.commitEntry(fs, dir, "t0-b0")
    assert(publishLog(spark, dir).size == n && replay.seq <= n)
    // the checkpoint lever, MEASURED on this 320-commit log: one
    // checkpoint read replaces 320 entry reads
    def timeMs(body: => Unit): Double = {
      val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e6
    }
    val plainMs = (1 to 5).map(_ => timeMs(publishLog(spark, dir))).min
    assert(checkpointPublishLog(spark, dir) == n.toLong)
    assert(vacuumCheckpointedEntries(spark, dir) == n)
    assert(publishLog(spark, dir) == log, "checkpoint+vacuum must not change the log")
    val ckptMs = (1 to 5).map(_ => timeMs(publishLog(spark, dir))).min
    info(f"[cas-log] publishLog($n entries): per-entry reads $plainMs%.1f ms, checkpointed $ckptMs%.1f ms")
    assert(ckptMs < plainMs,
      s"checkpointed read ($ckptMs ms) not faster than per-entry ($plainMs ms)")
  }

  test("two racing publishers + a racing erasure: full protocol, every batch readable, log consistent") {
    val dir = tmpDir("casfull")
    // seed a published batch so the erasure has live rows to witness
    assert(writeAuditPublish(spark,
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), dir, "seed", rules)
      .published)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val fails = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def run(body: => Unit): Unit = pool.execute { () =>
      try body
      catch { case th: Throwable => fails.compareAndSet(null, th) }
    }
    val perPublisher = 4
    for (t <- 0 until 2) run {
      for (i <- 0 until perPublisher) {
        val df = Seq((100L + t * 10 + i, i.toDouble)).toDF("id", "v")
        assert(writeAuditPublish(spark, df, dir, s"p$t-b$i", rules)
          .published)
      }
    }
    run {
      assert(eraseLogged(spark, dir, "g1", Seq(1L), "id", Seq("v"))
        .rowsDeleted == 1L)
    }
    pool.shutdown()
    assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
    if (fails.get() != null) throw fails.get()
    val log = publishLog(spark, dir)
    val expected = 1 + 2 * perPublisher + 1 // seed + publishers + erasure
    assert(log.map(_.seq) == (1L to expected.toLong),
      s"seqs contiguous through the race: ${log.map(_.seq)}")
    assert(log.count(isErasure) == 1)
    assert(log.map(_.batchId).distinct.size == expected)
    // every published batch is readable and attributed; the erased row
    // is gone and witnessed
    val ids = readPublished(spark, dir).select("id").as[Long].collect().toSet
    assert(!ids.contains(1L) && ids.contains(2L) &&
      ids.count(_ >= 100L) == 2 * perPublisher)
    assert(erasureReceipts(spark, dir, 0L, 99L)
      .as[(Long, Double)].collect().toSeq == Seq((1L, 1.0)))
    // and time travel still reconstructs every sequenced prefix
    assert(readAsOf(spark, dir, log.last.seq).count() ==
      1L + 2 * perPublisher)
  }
}
