package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-plus-delta compaction — the MERGE/upsert shape every
  * periodically-refreshed corpus needs: a large existing snapshot, a
  * small batch of updated/new rows, produce the next snapshot where the
  * newest version of each key wins.
  *
  * The reference has no notion of mutation (its one job is a single
  * finite batch, SURVEY.md §2 row 2); this is extension surface for the
  * incremental-corpus north star, the batch twin of
  * [[Dedup.crossJaccardPairsBloomPruned]]'s daily-ingest flow.
  */
object Upsert {

  /** Latest-version-wins merge of `snapshot` and `updates` (same
    * schema). One union + one window over the key shuffle; ties on
    * `versionCol` break toward the updates side, then by the tiebreak
    * column, so the result is deterministic.
    *
    * At 100 TB the snapshot side dominates; the shuffle is on `keyCol`
    * and AQE handles the (rare) hot keys. When the snapshot is stored
    * bucketed by `keyCol` (see [[graft.sources.Sinks]]), the snapshot
    * side's shuffle disappears entirely and only the delta moves —
    * that layout is what makes daily compaction affordable.
    */
  def latestByKey(snapshot: DataFrame, updates: DataFrame,
      keyCol: String, versionCol: String, tiebreakCol: String): DataFrame = {
    val unioned = snapshot.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col("__src").desc, col(tiebreakCol).desc)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }
}
