package graft.functions

/** Bradley–Terry preference-strength fitting via Hunter's MM iteration
  * [Hunter 2004, "MM algorithms for generalized Bradley-Terry models",
  * Annals of Statistics 32(1)]: given pairwise win counts w_ij over a
  * small item domain, iterate
  *
  *   p_i ← W_i / Σ_{j≠i} N_ij / (p_i + p_j),   then normalize Σp = 1
  *
  * (W_i = total wins of i, N_ij = games between i and j). Each MM step is
  * guaranteed non-decreasing in likelihood; a fixed iteration count keeps
  * the computation a pure deterministic function of the counts.
  *
  * This is the preference-data curation readout (RLHF/DPO pipelines): a
  * global strength scale + ranks from noisy pairwise preferences. The
  * item domain after aggregation is small (models, sources, policies), so
  * the solve is driver-side over the distributed pairwise aggregate — the
  * ExactSelect discipline: grid-scale data reduction on the cluster,
  * constant-size state on the driver.
  *
  * Determinism contract (the q95/q199 rules): every double SUM is a
  * SEQUENTIAL fold in sorted-key order — opponents folded in ascending j,
  * the normalization folded in ascending i — so a DuckDB oracle replaying
  * the same folds (`list_reduce(list(... ORDER BY j))`) is bit-identical;
  * no order-nondeterministic double aggregation anywhere.
  */
object BradleyTerry {

  /** @param types  item domain, any order (sorted internally)
    * @param games  N_ij keyed by UNORDERED pair (both (i,j) and (j,i)
    *               accepted; missing = 0)
    * @param wins   W_i (missing = 0)
    * @return item → normalized strength after `iters` MM steps from the
    *         uniform start p = 1 */
  def solve(types: Seq[String], games: Map[(String, String), Long],
      wins: Map[String, Long], iters: Int = 20): Map[String, Double] = {
    require(iters >= 0, s"iters must be non-negative: $iters")
    val ts = types.distinct.sorted
    def n(i: String, j: String): Long =
      games.getOrElse((i, j), games.getOrElse((j, i), 0L))
    var p: Map[String, Double] = ts.map(_ -> 1.0).toMap
    var it = 0
    while (it < iters) {
      val praw = ts.map { i =>
        // sequential fold over opponents in ascending j — oracle-mirrored
        val s = ts.filter(_ != i).foldLeft(0.0) { (acc, j) =>
          acc + n(i, j).toDouble / (p(i) + p(j))
        }
        // an item with no games keeps strength 0 instead of 0/0 (the
        // oracle mirrors this branch with the same `s = 0` CASE)
        i -> (if (s == 0.0) 0.0 else wins.getOrElse(i, 0L).toDouble / s)
      }.toMap
      val tot = ts.foldLeft(0.0)((acc, i) => acc + praw(i))
      p = ts.map(i => i -> praw(i) / tot).toMap
      it += 1
    }
    p
  }
}
