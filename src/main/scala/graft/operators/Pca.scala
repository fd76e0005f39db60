package graft.operators

/** Driver-side eigendecomposition for PCA over embedding covariance.
  *
  * The split of work mirrors the IVF/PQ pattern (IvfIndex.scala,
  * PqIndex.scala): the DATA-scaled pass is a distributed aggregate
  * (VectorAggregates.IntOuterProduct — one partial-agg'd exchange of
  * fixed-size moment buffers), and the MODEL-scaled math — an
  * eigensolve of a dim×dim matrix, dim=64 here — runs on the driver,
  * where it costs microseconds and stays deterministic. The resulting
  * components then flow back as broadcast literals in a pure
  * projection, so applying PCA to the corpus is exchange-free.
  *
  * Cyclic Jacobi (Golub & Van Loan §8.5) rather than LAPACK: a fixed
  * rotation order and a fixed convergence rule make the decomposition
  * a pure function of the input matrix — same doubles on every run
  * and every JVM — which is what the determinism specs pin. Jacobi is
  * O(dim³) per sweep and unconditionally stable on symmetric input;
  * for dim ≤ a few hundred (any real embedding width) it is the right
  * tool.
  */
object Pca {

  /** Eigendecomposition of a symmetric matrix. Returns (eigenvalues,
    * eigenvectors) sorted by eigenvalue DESCENDING, eigenvector k in
    * row k of the result, each with a deterministic sign convention
    * (largest-|entry| component positive, lowest index on ties).
    *
    * `a0` is not mutated. Convergence: sweeps until the off-diagonal
    * Frobenius mass falls under `tol` × the diagonal mass, or
    * `maxSweeps` — Jacobi converges quadratically, so 64×64 input
    * lands in ~6 sweeps; hitting maxSweeps throws rather than
    * returning a half-diagonalized basis.
    */
  def jacobiEigen(
      a0: Array[Array[Double]],
      maxSweeps: Int = 50,
      tol: Double = 1e-14
  ): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    require(n > 0 && a0.forall(_.length == n), "square matrix required")
    val a = Array.tabulate(n, n)((i, j) => {
      require(
        math.abs(a0(i)(j) - a0(j)(i)) <= 1e-9 * (1.0 + math.abs(a0(i)(j))),
        s"not symmetric at ($i,$j)"
      )
      a0(i)(j)
    })
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

    def offMass: Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += 2.0 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    def diagMass: Double = {
      var s = 0.0
      var i = 0
      while (i < n) { s += a(i)(i) * a(i)(i); i += 1 }
      math.max(s, Double.MinPositiveValue)
    }

    var sweep = 0
    var converged = offMass <= tol * diagMass
    while (!converged && sweep < maxSweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              math.signum(theta) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // rotate rows/cols p,q of a
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            // accumulate the rotation into v (columns p,q)
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
      converged = offMass <= tol * diagMass
    }
    require(converged, s"Jacobi did not converge in $maxSweeps sweeps")

    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { col =>
      val vec = Array.tabulate(n)(r => v(r)(col))
      // deterministic sign: make the largest-|entry| component positive
      val pivot = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(pivot) < 0.0) vec.map(x => -x) else vec
    }.toArray
    (values, vectors)
  }

  /** Covariance matrix from exact integer moments (upper triangle of
    * Σ v·vᵀ, element sums, count): C = S/n − (m/n)(m/n)ᵀ. The one
    * float step of the PCA pipeline, done identically from the same
    * exact integers on every run.
    */
  def covarianceFromMoments(
      upper: Array[Long],
      sums: Array[Long],
      n: Long,
      dim: Int
  ): Array[Array[Double]] = {
    require(n > 0, "covariance of an empty corpus")
    require(upper.length == dim * (dim + 1) / 2 && sums.length == dim)
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    var k = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val cov =
          upper(k).toDouble / n - (sums(i).toDouble / n) * (sums(j).toDouble / n)
        c(i)(j) = cov
        c(j)(i) = cov
        k += 1
        j += 1
      }
      i += 1
    }
    c
  }
}
