package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded theta-join: all pairs with `|value_a - value_b| <= width`
  * (optionally within an equi-key), WITHOUT the O(n²) cross product a
  * naive theta join plans to.
  *
  * The standard trick: bucket every row by `floor(value / width)`; any
  * qualifying pair's buckets differ by at most 1, so candidates come
  * from an EQUI-join of each row's {bucket, bucket+1} against the other
  * side's bucket — Spark plans a plain shuffled hash/sort-merge join on
  * the bucket key instead of a broadcast-nested-loop. Candidate volume
  * is Σ per-bucket n² (data-dependent, tunable via width), not global
  * n²; the exact |Δ| <= width predicate then keeps results identical to
  * the naive join. At 100 TB a hot value (one bucket holding a large
  * fraction of rows) is the thing to watch — AQE skew-join splits it,
  * or pre-salt the bucket key.
  *
  * The reference has no joins (SURVEY.md §2 "Absent categories");
  * extension surface demonstrating non-equi join scalability.
  */
object BandJoin {

  /** Self band-join: pairs (a < b by `idCol`) with
    * `|value_a - value_b| <= width`, both rows sharing `eqKeyCol`.
    * Output: (key, a, b, diff). */
  def selfBandJoin(df: DataFrame, idCol: String, valueCol: String,
      width: Double, eqKeyCol: String): DataFrame = {
    require(width > 0.0, "width must be positive")
    val v = col(valueCol).cast("double")
    val bucketed = df.select(col(eqKeyCol).as("k"), col(idCol).as("id"),
      v.as("v"), floor(v / width).as("bucket"))
    // left side probes its own and the NEXT bucket; every qualifying
    // unordered pair is produced at least once (via its lower-bucket
    // member), same-bucket pairs twice (both orientations) — the
    // canonicalized distinct collapses them
    val probe = bucketed.select(col("k"), col("id"), col("v"),
      explode(array(col("bucket"), col("bucket") + 1)).as("bucket"))
    probe.join(bucketed
        .select(col("k"), col("id").as("id_r"), col("v").as("v_r"), col("bucket")),
        Seq("k", "bucket"))
      .filter(col("id") =!= col("id_r") && abs(col("v") - col("v_r")) <= width)
      .select(col("k"),
        least(col("id"), col("id_r")).as("a"),
        greatest(col("id"), col("id_r")).as("b"),
        round(abs(col("v") - col("v_r")), 6).as("diff"))
      .distinct()
  }
}
