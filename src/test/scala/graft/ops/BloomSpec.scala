package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom pre-gate kernel: the no-false-negative guarantee (the property
  * that makes d7b's result bit-identical to the plain anti-join), the
  * false-positive tail staying near its designed rate, and the pre-gate
  * actually firing on the d7 ingest shape (most of a novel batch admitted
  * without touching the store join). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val mBits = 4096
  private val k = 3

  test("no false negatives: every stored key is bloom-positive") {
    val store = (0 until 400).map(i => s"member-$i").toDF("key")
    val bits = Bloom.buildBits(store, $"key", mBits, k)
    val neg = store.filter(!Bloom.mightContain($"key", bits, k)).count()
    assert(neg == 0L, s"$neg stored keys tested bloom-negative")
  }

  test("false-positive tail near the designed rate (m/n=10.24, k=3 -> ~2%)") {
    val store = (0 until 400).map(i => s"member-$i").toDF("key")
    val bits = Bloom.buildBits(store, $"key", mBits, k)
    val outsiders = (0 until 2000).map(i => s"outsider-$i").toDF("key")
    val fp = outsiders.filter(Bloom.mightContain($"key", bits, k)).count()
    // theoretical ~1.6%; allow generous slack, but an off-by-one in the
    // bit math would push this to ~100% and a dead filter to 0% positives
    // on members (caught above)
    assert(fp.toDouble / 2000 < 0.10, s"false-positive rate ${fp / 20.0}%")
  }

  test("bit positions cover the whole bitset range (no truncated modulus)") {
    val store = (0 until 4000).map(i => s"k$i").toDF("key")
    val bits = Bloom.buildBits(store, $"key", mBits, k)
    // with 12k insertions over 4096 bits, every 64-bit word should see
    // at least one set bit unless indexing silently folds the range
    val emptyWords = bits.count(_ == 0L)
    assert(emptyWords == 0, s"$emptyWords of ${bits.length} words never hit")
  }

  test("d7b pre-gate fires: most of the batch is admitted map-side") {
    val dir = "/root/testdata/sf0.001"
    val store = (0 until 400).map(i => s"stored-$i").toDF("fp")
    val bits = Bloom.buildBits(store, $"fp", mBits, k)
    // batch = 90% novel + 10% store hits, the d7 ingest shape
    val batch = ((0 until 360).map(i => s"novel-$i") ++
      (0 until 40).map(i => s"stored-$i")).toDF("fp")
    val positives = batch.filter(Bloom.mightContain($"fp", bits, k)).count()
    assert(positives >= 40, s"true store hits must all test positive")
    assert(positives < 80,
      s"pre-gate admitted too little: $positives/400 bloom-positive")
    // and the composed query equals the plain anti-join on real data
    val viaBloom = graft.SparkEntry.queries("d7b_bloom_dedup")(spark, dir)
    val plain = graft.SparkEntry.queries("d7_incremental_dedup")(spark, dir)
    assert(viaBloom.collect().toSeq == plain.collect().toSeq)
  }
}
