package graft.gemm

/** Nearest-divisor grid factorization — a port of the reference's one
  * reusable planning utility, `closest_factor`
  * (/root/reference/src/util.rs:21-61). The reference uses it to shape
  * its reducer grid: `para_m = closest_factor(reducer_num,
  * sqrt(reducer_num))`, `para_n = reducer_num / para_m`
  * (outer_product.rs:162-165); here the same factorization chooses
  * BlockGemm's block grid from the matrix shape and the session's
  * parallelism.
  *
  * Semantics note: the Rust original finds the same two candidate
  * divisors (nearest at-or-below and nearest at-or-above) but its final
  * nearness comparison computes `res[0] - factor` on the at-or-below
  * candidate — a usize underflow whenever that candidate is strictly
  * below. We implement the evident intent: return whichever candidate
  * is nearer, ties resolved to the smaller divisor.
  */
object Grid {

  /** The divisor of `value` nearest to `factor` (ties go down).
    * `factor` is clamped into [1, value].
    *
    * Note: because the Rust original's underflowed `res[0] - factor`
    * wraps to a huge usize, the reference effectively picks the FARTHER
    * candidate whenever both divisors are strictly off-factor (e.g.
    * `closest_factor(10, 3)` → 5 there, 2 here) — so grids ported from
    * reference runs can differ in shape. Either factorization is a
    * valid block grid; correctness is unaffected. */
  def closestFactor(value: Int, factor: Int): Int = {
    require(value >= 1, s"value must be >= 1, got $value")
    val f = factor.max(1).min(value)
    val down = (f to 1 by -1).find(value % _ == 0).get
    val up = (f to value).find(value % _ == 0).get
    if (f - down <= up - f) down else up
  }

  /** Near-square (gm, gn) grid with gm * gn == cells — the reference's
    * reducer-grid shape (outer_product.rs:162-165). */
  def squareish(cells: Int): (Int, Int) = {
    val gm = closestFactor(cells, math.sqrt(cells.toDouble).toInt)
    (gm, cells / gm)
  }

  /** Block sizes for an (m x n) result computed at `parallelism`: tile
    * the result over a near-square `parallelism`-cell grid, one block
    * per cell (reference set_gemm: reducer_m = ceil(m / para_m),
    * reducer_n = ceil(n / para_n), outer_product.rs:165-167), clamped
    * to at least 1. */
  def blockSizes(m: Long, n: Long, parallelism: Int): (Int, Int) = {
    val (gm, gn) = squareish(parallelism.max(1))
    val rows = ((m + gm - 1) / gm).max(1L).min(Int.MaxValue.toLong).toInt
    val cols = ((n + gn - 1) / gn).max(1L).min(Int.MaxValue.toLong).toInt
    (rows, cols)
  }
}
