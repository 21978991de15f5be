package graft.io

/** S4: token-bucket rate limiter (src/dependencies/TokenBucket.py:10-31).
  * The reference shares one bucket across processes via a Manager proxy; on
  * Spark each partition gets `globalRate / numPartitions` so the aggregate
  * request rate stays at the global cap without any cross-executor
  * coordination (SURVEY §2.1 S4).
  */
class TokenBucket(ratePerSec: Double, burst: Int = 1) extends Serializable {
  private var tokens: Double = burst.toDouble
  private var lastNs: Long = System.nanoTime()

  /** Block until a token is available, then consume it. */
  def acquire(): Unit = synchronized {
    while ({
      val now = System.nanoTime()
      tokens = math.min(burst.toDouble, tokens + (now - lastNs) * 1e-9 * ratePerSec)
      lastNs = now
      tokens < 1.0
    }) {
      val waitMs = math.max(1L, ((1.0 - tokens) / ratePerSec * 1000).toLong)
      Thread.sleep(waitMs)
    }
    tokens -= 1.0
  }
}

object TokenBucket {
  /** Per-partition limiter rate for a global cap. */
  def perPartitionRate(globalRate: Double, numPartitions: Int): Double =
    globalRate / math.max(1, numPartitions)
}
