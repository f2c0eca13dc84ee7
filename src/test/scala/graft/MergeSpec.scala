package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Merge

class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merge: latest version per key wins; deletes remove; inserts append") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a1", 1L, false), // stale update for key 1...
      (1L, "a2", 2L, false), // ...superseded by version 2
      (2L, "dead", 1L, false),
      (2L, "dead", 2L, true), // delete wins at the higher version
      (9L, "new", 1L, false)) // insert (key absent from snapshot)
      .toDF("k", "v", "version", "deleted")
    val r = Merge.merge(snap, changes, Seq("k"), "version", "deleted")
      .as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "a2", 3L -> "c", 9L -> "new"))
  }

  test("merge: empty changeset is the identity; output schema = snapshot schema") {
    val snap = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq.empty[(Long, String, Long, Boolean)]
      .toDF("k", "v", "version", "deleted")
    val r = Merge.merge(snap, changes, Seq("k"), "version", "deleted")
    assert(r.columns.toSeq == Seq("k", "v"))
    assert(r.as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }
}
