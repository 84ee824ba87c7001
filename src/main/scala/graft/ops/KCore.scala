package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling — the graph-density filter
  * of the dedup family: the k-core is the maximal subgraph where every
  * vertex keeps >= k neighbors INSIDE the subgraph, so fringe documents
  * that merely touch a dup cluster peel away while the dense near-dup
  * community survives (connected components can't make that
  * distinction — one weak edge merges everything; label propagation
  * needs a majority; the core demands k robust links).
  *
  * Each peel round: one degree aggregation over the surviving edge set
  * + one semi-join to drop sub-k vertices — two keyed shuffles, nothing
  * global. Peeling is monotone (the surviving set only shrinks) and
  * IDEMPOTENT at the fixpoint, which is what lets a SQL oracle replay
  * it as a FIXED unroll: extra rounds after convergence are no-ops, so
  * "R rounds" and "fixpoint, if reached within R" agree; [[core]]
  * fails loudly if R rounds were not enough (a path graph peels one
  * layer per round — size the budget to the graph's diameter; dup
  * graphs are dense near-cliques and converge in a handful).
  */
object KCore {

  /** Vertices of the k-core with their within-core degree:
    * (id, core_deg). Input: unique undirected pairs, no self-loops.
    * Requires convergence within `maxRounds` (throws otherwise rather
    * than returning a partially-peeled overapproximation). */
  def core(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 16): DataFrame = {
    require(k >= 1, s"kcore: k >= 1 ($k)")
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    var sym = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var edgeCount = sym.count()
    var round = 0
    var converged = false
    // maxRounds + 1 loop iterations: `maxRounds` PRODUCTIVE peels plus
    // one no-change confirmation round — a graph needing exactly
    // maxRounds peels (the oracle's fixed unroll budget) must converge,
    // not throw because confirmation consumed its last iteration
    while (!converged && round < maxRounds + 1) {
      val deg = sym.groupBy("a").agg(count(lit(1)).as("d"))
      val alive = deg.filter(col("d") >= k).select(col("a"))
      val next = sym
        .join(alive, Seq("a"), "left_semi")
        .join(alive.select(col("a").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(true)
      // peel fixpoint: no edge was removed this round (edges only ever
      // shrink, so one running count per round suffices)
      val nextCount = next.count()
      converged = nextCount == edgeCount
      edgeCount = nextCount
      sym = next
      round += 1
    }
    require(converged,
      s"k-core did not converge in $maxRounds rounds — raise maxRounds " +
        "(graphs with long induced paths peel one layer per round)")
    sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("core_deg"))
  }
}
