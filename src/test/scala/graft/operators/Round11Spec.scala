package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 wave: the data-derived boilerplate composition
  * (q_curation_v3) plan pins, and the README count pins that keep the
  * repo's advertised numbers generated rather than guessed. */
class Round11Spec extends SparkSpec {

  // ---- curation_v3: exchange budget of the composed plan ----

  test("curation_v3: heavy-hitter candidates broadcast back onto the " +
      "token stream; exchange budget holds; no cartesian, no window") {
    val df = graft.SparkEntry.queries("q_curation_v3")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val broadcasts = p.linesIterator.count(_.contains("BroadcastExchange"))
    info(s"exchanges=$exchanges broadcasts=$broadcasts")
    // component budget (12 measured): the partial→final pairs of the
    // HH grouped sketch agg, the recount (key,item) agg, the per-doc
    // token/hit counts, the perDoc⋈hits doc_id join, the mix stratum
    // totals, and the final per-lang agg — every exchange carries an
    // AGGREGATED or doc-level frame, never the raw token stream; the
    // dynamic-stopword list itself must come back as a BROADCAST
    // (bounded by construction: langs × tracked). Growth past the pin
    // means a stage started shuffling tokens.
    assert(exchanges <= 12, s"expected <= 12 exchanges, got $exchanges:\n$p")
    assert(broadcasts >= 2, // hh list + mix rates (+ AQE may add more)
      s"expected the bounded frames broadcast, got $broadcasts:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p) // no ranking anywhere in v3
  }

  test("curation_v3: result matches the unscreened mix only if the " +
      "boilerplate screen is a no-op — here it must actually drop docs") {
    val docs = graft.sources.Sources.table(spark, sf0001, "documents")
      .filter(col("lang").isNotNull)
    val total = docs.count()
    val keptDocs = graft.SparkEntry.queries("q_curation_v3")(spark, sf0001)
      .agg(sum(col("n_docs"))).head().getLong(0)
    assert(keptDocs > 0L, "screen dropped everything")
    assert(keptDocs < total,
      s"screen kept all $total docs — the dynamic list is not filtering")
  }

  // ---- README: the advertised spec count is generated, not guessed ----

  test("README's sbt test line states the source-registered spec count") {
    // every spec in this repo is statically registered (one `test(`
    // per case — no dynamic registration loops), so the source grep IS
    // the runtime total; Round10Spec pins the query count the same way
    val root = java.nio.file.Paths.get("src/test/scala")
    val testRe = java.util.regex.Pattern.compile("^\\s*test\\(")
    var n = 0
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          .linesIterator.foreach(l => if (testRe.matcher(l).find()) n += 1)
      }
    }
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val want = s"# $n specs"
    assert(readme.contains(want),
      s"README.md must contain '$want' (stale spec count?)")
  }
}
