package graft

/** The engine's named query surface: one entry per SURVEY.md §2 operator
  * (plus the LLM-data-pipeline operators), each paired where SQL-expressible
  * with a DuckDB oracle in [[oracle]].
  *
  * Cross-engine parity rules used throughout (so value-hash comparison
  * holds):
  *  - aggregates of floating sums are `round`ed (4-6 dp) on BOTH sides —
  *    summation order differs between engines at ~1e-15 relative;
  *  - ordering/tie-breaks always form a total order using only exact IEEE
  *    ops (x*x, not pow/sqrt) so ranks match bit-for-bit;
  *  - counts are Long on the Spark side; DuckDB integer `sum`s are CAST to
  *    BIGINT in the oracle (DuckDB widens to HUGEINT by default);
  *  - epoch seconds via floor() on both sides (DuckDB's CAST rounds).
  */
object Queries {
  type Q = QueriesBase.Q

  /** The family part files (r13 split of the former 16k-line monolith).
    * Parts are key-disjoint — QueriesContractSpec asserts that the merged
    * size equals the sum of part sizes, so a duplicated key can never be
    * silently absorbed by `++`. */
  private[graft] val parts: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (QueriesPart1.queries, QueriesPart1.oracle),
    (QueriesPart2.queries, QueriesPart2.oracle),
    (QueriesPart3.queries, QueriesPart3.oracle),
    (QueriesPart4.queries, QueriesPart4.oracle),
    (QueriesPart5.queries, QueriesPart5.oracle),
    (QueriesPart6.queries, QueriesPart6.oracle),
    (QueriesPart7.queries, QueriesPart7.oracle),
    (QueriesPart8.queries, QueriesPart8.oracle))

  val queries: Map[String, Q] = parts.iterator.map(_._1).reduce(_ ++ _)
  val oracle: Map[String, String] = parts.iterator.map(_._2).reduce(_ ++ _)
}
