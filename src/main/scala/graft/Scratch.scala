package graft

/** Deterministic scratch directories for the graded index-store
  * round-trips (MinHash band store, IVF-PQ code store, DSIR count
  * store).
  *
  * A fresh `createTempDirectory` per execution leaked one full store
  * copy per run: the 3-pass interleaved bench plus the correctness
  * pass re-execute each store query several times per round, so
  * copies compounded across rounds. A FIXED per-(store, fixture-dir)
  * path written with `mode("overwrite")` bounds disk to one live copy
  * per store per fixture — each execution replaces the previous one,
  * which is also the swap protocol the mutable-store maintainers use
  * (SCALE.md §13).
  */
object Scratch {
  def dir(store: String, sfDir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-$store-${java.lang.Integer.toHexString(sfDir.hashCode)}"
    ).getAbsolutePath
}
