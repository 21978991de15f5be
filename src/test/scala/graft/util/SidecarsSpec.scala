package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Writer-fencing discipline of the shared sidecar-swap kernel: of two
  * writers whose swap windows overlap, exactly one commits — the loser
  * fails loudly before any rename touches the store and leaves no
  * staging garbage. */
class SidecarsSpec extends SparkSpec {
  import spark.implicits._

  private def mk(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-fence-$tag").toString

  private def readN(root: String): Seq[Long] =
    Sidecars.read(spark, root, "side").select($"v")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("two interleaved writers: one winner, one clean failure, store " +
      "never torn") {
    val root = mk("race")
    Sidecars.swap(spark, root, "side", Seq(0L).toDF("v")) // epoch 1
    // W1 and W2 both read the store at epoch 1, then W2 commits first;
    // W1's commit must fail at the fence, not overwrite W2
    val e = Sidecars.fenceEpoch(spark, root)
    assert(e == 1L)
    // W2 wins the race (its whole swap runs inside W1's staged window)
    val loser = intercept[IllegalStateException] {
      Sidecars.swapStaged(spark, root, "side", expectedEpoch = Some(e)) { next =>
        Seq(10L, 11L).toDF("v").write.parquet(next) // W1 stages...
        // ...and W2 commits while W1 is still in flight
        Sidecars.swapStaged(spark, root, "side", expectedEpoch = Some(e)) {
          n2 => Seq(20L, 21L).toDF("v").write.parquet(n2)
        }
      }
    }
    assert(loser.getMessage.contains("writer fence"))
    // the store holds W2's COMPLETE version — never W1's, never a mix
    assert(readN(root) == Seq(20L, 21L))
    assert(Sidecars.fenceEpoch(spark, root) == 2L)
    // the loser's staging directory is cleaned up
    val leftovers = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("side.next"))
    assert(leftovers.isEmpty, s"stale staging dirs: ${leftovers.mkString(",")}")
  }

  test("sequential writers advance the epoch and a stale expected epoch " +
      "is refused even after fence GC") {
    val root = mk("seq")
    for (k <- 1 to 8) // GC keeps a short history; epoch-1 is long gone
      Sidecars.swap(spark, root, "side", Seq(k.toLong).toDF("v"))
    assert(Sidecars.fenceEpoch(spark, root) == 8L)
    assert(readN(root) == Seq(8L))
    // a writer that read the store at epoch 3 must NOT be able to claim
    // the (GC'd) epoch-4 mark and rewrite history
    val stale = intercept[IllegalStateException] {
      Sidecars.swapStaged(spark, root, "side", expectedEpoch = Some(3L)) {
        next => Seq(99L).toDF("v").write.parquet(next)
      }
    }
    assert(stale.getMessage.contains("writer fence"))
    assert(readN(root) == Seq(8L), "stale writer must not overwrite")
  }

  test("a crashed stage leaves no garbage and the next writer proceeds") {
    val root = mk("crash")
    Sidecars.swap(spark, root, "side", Seq(1L).toDF("v"))
    intercept[RuntimeException] {
      Sidecars.swapStaged(spark, root, "side") { _ =>
        throw new RuntimeException("simulated stage crash")
      }
    }
    val leftovers = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("side.next"))
    assert(leftovers.isEmpty)
    assert(readN(root) == Seq(1L), "crashed stage must not move the store")
    Sidecars.swap(spark, root, "side", Seq(2L).toDF("v"))
    assert(readN(root) == Seq(2L))
  }

  test("claim() fences raw (non-swap) mutations: a stale claimant fails " +
      "before touching anything, a chained claimant proceeds") {
    val root = mk("claim")
    Sidecars.swap(spark, root, "side", Seq(1L).toDF("v")) // epoch 1
    val stale = Sidecars.fenceEpoch(spark, root)
    // another writer's raw mutation claims first
    val e2 = Sidecars.claim(spark, root)
    assert(e2 == 2L)
    // the stale claimant (read before the mutation) must fail loudly
    val loser = intercept[IllegalStateException](
      Sidecars.claim(spark, root, Some(stale)))
    assert(loser.getMessage.contains("writer fence"))
    // chaining: the winner threads its claimed epoch onward
    val e3 = Sidecars.claim(spark, root, Some(e2))
    assert(e3 == 3L)
    assert(Sidecars.fenceEpoch(spark, root) == 3L)
  }

  test("READER-ATOMIC: a reader loop racing a maintenance-swap loop " +
      "never fails and always sees a complete committed version") {
    val root = mk("readrace")
    // every version holds rows (k, k) — a torn or mixed read would
    // surface as a row count != 2 or mismatched values
    def versionDf(k: Long) = Seq(k, k).toDF("v")
    Sidecars.swap(spark, root, "side", versionDf(0L))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicLong(0L)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val rows = Sidecars.read(spark, root, "side")
            .collect().map(_.getLong(0)).toSeq
          if (rows.length != 2 || rows.distinct.length != 1)
            failures.add(s"torn read: $rows")
          reads.incrementAndGet()
        } catch {
          case e: Throwable => failures.add(s"read failed: $e")
        }
      }
    })
    reader.start()
    // 25 maintenance swaps while the reader hammers the store (the r13
    // layout's retire-then-commit window made exactly this reader see
    // an absent directory)
    for (k <- 1L to 25L) Sidecars.swap(spark, root, "side", versionDf(k))
    stop.set(true)
    reader.join(30000)
    assert(failures.isEmpty, s"racing reader failed: ${failures.peek()}")
    assert(reads.get() > 0, "reader loop never completed a read")
    // retention: only the newest KeepVersions versions remain on disk
    val versions = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("side.v")).sorted
    assert(versions.length == Sidecars.KeepVersions,
      s"expected ${Sidecars.KeepVersions} retained versions, " +
        s"got ${versions.mkString(",")}")
    assert(Sidecars.read(spark, root, "side").collect()
      .map(_.getLong(0)).toSeq == Seq(25L, 25L))
  }

  test("pre-fence stores (no _fence dir) upgrade transparently") {
    val root = mk("upgrade")
    // simulate a store written before fencing existed
    Seq(7L).toDF("v").write.parquet(root + "/side")
    assert(Sidecars.fenceEpoch(spark, root) == 0L)
    Sidecars.swap(spark, root, "side", Seq(8L).toDF("v"))
    assert(readN(root) == Seq(8L))
    assert(Sidecars.fenceEpoch(spark, root) == 1L)
  }
}
