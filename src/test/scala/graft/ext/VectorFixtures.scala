package graft.ext

/** Shared synthetic embedding fixtures for the ANN/dedup gates.
  *
  * Shared ON PURPOSE, not just for brevity: the cross-index assertions
  * (residual-vs-raw reconstruction error in IvfPqSpec, semantic-vs-global
  * pair equality in SemDedupSpec, IVF/PQ recall floors) are only
  * meaningful because every spec runs over the IDENTICAL corpus — a
  * per-spec copy could drift (different jitter, cluster count) and
  * silently invalidate the comparison without any test naming it.
  */
object VectorFixtures {

  /** splitmix64-derived deterministic 64-dim vector in [-0.5, 0.5). */
  def synthVec(seed: Int): Seq[Float] = (0 until 64).map { d =>
    var z = (seed.toLong * 64 + d) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (((z >>> 11).toDouble / (1L << 53).toDouble) - 0.5).toFloat
  }

  /** 4 well-separated clusters × 50 points with 5% jitter: hash-order
    * seeds concentrate in dense regions, so unrefined quantizer cells
    * are skewed; Lloyd must re-balance. `i % 4` is the true cluster.
    */
  def clusteredRows: Seq[(Long, Seq[Float])] = (0 until 200).map { i =>
    val center = synthVec(1000 + i % 4)
    val jitter = synthVec(2000 + i).map(_ * 0.05f)
    (i.toLong, center.zip(jitter).map { case (c, j) => c + j })
  }
}
