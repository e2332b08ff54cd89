package graft.pipeline

/** The one home of the integer-hash constants that BOTH the Spark
  * expressions and the interpolated DuckDB oracle SQL depend on
  * (Dedup's minhash/simhash token hashing, Similarity's LSH plane
  * hashing). Editing a constant here changes both pipelines and their
  * oracles together — two private copies previously risked silent
  * desynchronization. */
private[graft] object HashConstants {
  /** Modulus of the polynomial ascii fold and the affine permutations. */
  val HashPrime = 1000000007L
  /** Knuth's 32-bit multiplicative constant — spreads small fold values. */
  val Knuth = 2654435761L
  /** 2^32, the modulus of the Knuth hash when used as a bit source. */
  val TwoTo32 = 4294967296L
}
