package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("latestByKey: updates win, new keys insert, untouched keys survive") {
    val snap = Seq(
      (1L, "a", 1L), (2L, "b", 1L), (3L, "c", 2L),
    ).toDF("id", "payload", "version")
    val upd = Seq(
      (2L, "b2", 2L), // newer → replaces
      (3L, "c0", 1L), // older → ignored
      (4L, "d", 1L),  // new key → inserted
    ).toDF("id", "payload", "version")
    val out = Upsert.latestByKey(snap, upd, "id", "version", "id")
      .select($"id", $"payload", $"version")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 2L), (4L, "d", 1L)))
  }

  test("latestByKey: version tie breaks toward the updates side") {
    val snap = Seq((1L, "old", 5L)).toDF("id", "payload", "version")
    val upd = Seq((1L, "new", 5L)).toDF("id", "payload", "version")
    val out = Upsert.latestByKey(snap, upd, "id", "version", "id")
      .select($"payload").as[String].collect()
    assert(out.toSeq === Seq("new"))
  }

  test("latestByKey: empty updates is identity; empty snapshot returns updates") {
    val snap = Seq((1L, "a", 1L)).toDF("id", "payload", "version")
    val empty = snap.filter(lit(false))
    assert(Upsert.latestByKey(snap, empty, "id", "version", "id")
      .count() === 1L)
    assert(Upsert.latestByKey(empty, snap, "id", "version", "id")
      .count() === 1L)
    assert(Upsert.latestByKey(empty, empty, "id", "version", "id")
      .count() === 0L)
  }

  test("latestByKey keeps exactly one row per key at corpus scale") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("version", lit(1))
    val upd = docs.filter($"doc_id" % 7 === 0)
      .withColumn("version", lit(2))
    val out = Upsert.latestByKey(docs, upd, "doc_id", "version", "doc_id")
    assert(out.count() === docs.count())
    assert(out.filter($"version" === 2).count() === upd.count())
    assert(out.groupBy($"doc_id").count().filter($"count" > 1).count() === 0L)
  }
}
