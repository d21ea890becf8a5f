package graft

import org.apache.spark.sql.functions._

/** Round-14 invariants: the composed A/V curation pipeline's plan
  * budget, the k-means||-trained IVF's recall vs the lowest-id-init
  * index, and the streaming-assign schema pin from the round's ADVICE
  * fix. */
class Round14Spec extends SparkSpec {

  test("q_curation_av: doc-keyed assembly adds no unbounded shuffles — " +
      "bounded exchange count, no cartesian product, no global window") {
    val df = graft.SparkEntry.queries("q_curation_av")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // legs: keyframe agg + window, pooled agg, utterance agg + window,
    // joint join, semanticPairs' cell join, final doc-keyed joins —
    // every one keyed on doc/cell ids; the budget is the ceiling the
    // composition must hold, not a target
    assert(exchanges <= 16, s"expected <= 16 exchanges, got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // every Window in the plan must be partitioned (sceneChanges' lag
    // and utteranceSegments' row_number are both per-id)
    val unpartitionedWindow = p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("partitionBy=[]"))
    assert(!unpartitionedWindow, p)
  }

  test("q_curation_av: gates and dedup both bite — kept is a nonempty " +
      "strict subset, and every dropped row names its reason") {
    val rows = graft.SparkEntry.queries("q_curation_av")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val kept = rows.count(_.getAs[Boolean]("kept"))
    assert(kept > 0, "pipeline dropped everything")
    assert(kept < rows.length, "pipeline kept everything — no gate bit")
    rows.filterNot(_.getAs[Boolean]("kept")).foreach { r =>
      val why = r.getAs[Boolean]("is_dup") ||
        r.getAs[Double]("rms") < 0.34 ||
        r.getAs[Long]("n_keyframes") < 1 || r.getAs[Long]("n_utterances") < 1
      assert(why, s"row dropped for no stated reason: $r")
    }
  }

  test("k-means||-trained IVF recall is measured and competitive with " +
      "the lowest-id-init index (the q_ann_recall truth composition)") {
    val baseline = graft.SparkEntry.queries("q_ann_recall")(spark, sf0001)
      .head().getAs[Double]("mean_recall")
    val kmeanspar = graft.SparkEntry
      .queries("q_ann_kmeanspar_recall")(spark, sf0001)
      .head().getAs[Double]("mean_recall")
    assert(baseline > 0.0 && kmeanspar > 0.0)
    // the scalable init must not cost recall catastrophically — the
    // documented comparison the round-13 verdict asked for (numbers
    // are data-dependent; the bound is the invariant)
    assert(kmeanspar >= baseline - 0.25,
      s"k-means|| IVF recall $kmeanspar collapsed vs lowest-id $baseline")
  }

  test("streaming assign: vec_id is LONG on BOTH sides of the literal " +
      "cap, so a sink schema cannot change when k grows past 32") {
    import org.apache.spark.sql.types._
    // schema-only check: an unbounded source with INT ids on purpose —
    // the plan (and its sink schema) builds without starting the query
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_assign_schema").toFile
    tmp.deleteOnExit()
    val stream = spark.readStream
      .schema(new StructType().add("vec_id", IntegerType)
        .add("embedding", ArrayType(DoubleType)))
      .parquet(tmp.getAbsolutePath)
    def schemaAt(k: Int): org.apache.spark.sql.types.StructType = {
      val cents = (0 until k).map(i => (i, Seq(i.toDouble, 0.0)))
      graft.streaming.StreamingOps.assignToCentroids(stream, cents).schema
    }
    val small = schemaAt(8)   // literal argmin path
    val wide = schemaAt(40)   // closure path
    // names + types (nullability legitimately differs between the
    // expression and the tuple-encoded closure paths)
    def sig(s: StructType) = s.map(f => (f.name, f.dataType))
    assert(sig(small) === sig(wide),
      s"schema flips across the literal cap:\n$small\nvs\n$wide")
    assert(small("vec_id").dataType === LongType)
  }
}
