/** graft — a Spark-native analytics engine with the capabilities of the
  * kaylee MapReduce framework, extended for LLM-data-pipeline work.
  *
  * Entry points:
  *  - [[graft.core.MapReduce]] / [[graft.core.MapReduceJob]] — the typed
  *    parity surface (`datafn → map → shuffle → reduce → collect`)
  *  - [[graft.operators.TextAnalysis]], [[graft.operators.Dedup]],
  *    [[graft.operators.Similarity]], [[graft.operators.Events]],
  *    [[graft.operators.Sampling]], [[graft.operators.Curation]] —
  *    the pipeline operator families
  *  - [[graft.streaming.StreamingOps]] — the same event operators,
  *    incremental
  *  - [[graft.sources.Sources]] / [[graft.sources.Sinks]] — layout-aware
  *    IO
  *  - [[graft.GraftExtensions]] — SparkSessionExtensions hook for the
  *    native SQL functions (`rolling_hash`, `vector_dot`)
  *  - [[graft.SparkEntry]] — the driver/verification contract: every
  *    operator as a named query with a DuckDB oracle
  *
  * Design rules are documented in README.md; scale behavior per operator
  * family in SCALE.md; the reference mapping in SURVEY.md §8.
  */
package object graft
