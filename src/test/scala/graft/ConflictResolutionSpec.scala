package graft

import graft.graph.ConflictResolution

/** Most-recent-wins belief revision vs hand-computed outcomes: recency
  * wins, observation-weight then object-value tie-breaks, pass-through of
  * non-functional predicates, repartition invariance. */
class ConflictResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val prov = Seq(
    // works_at: turn 9 beats turn 3 despite fewer observations
    ("alice", "works_at", "acme", 5L, 3),
    ("alice", "works_at", "globex", 1L, 9),
    // lives_in: same recency -> more observations wins
    ("bob", "lives_in", "oslo", 4L, 7),
    ("bob", "lives_in", "lima", 2L, 7),
    // same recency AND weight -> lexicographically smaller object wins
    ("carol", "works_at", "zeta", 3L, 5),
    ("carol", "works_at", "alpha", 3L, 5),
    // no conflict: survives with n_dropped = 0
    ("dave", "works_at", "acme", 1L, 1),
    // non-functional predicate: BOTH rows pass through
    ("alice", "visited", "paris", 1L, 2),
    ("alice", "visited", "oslo", 1L, 4)
  ).toDF("subj", "pred", "obj", "n_observations", "last_turn")

  private val functional = Seq("works_at", "lives_in").toDF("pred")

  test("recency, weight, and value tie-breaks; pass-through") {
    val got = ConflictResolution.resolveMostRecent(prov, functional)
      .as[(String, String, String, Long)].collect().toSet
    assert(got == Set(
      ("alice", "works_at", "globex", 1L),
      ("bob", "lives_in", "oslo", 1L),
      ("carol", "works_at", "alpha", 1L),
      ("dave", "works_at", "acme", 0L),
      ("alice", "visited", "paris", 0L),
      ("alice", "visited", "oslo", 0L)))
  }

  test("repartition invariance") {
    val a = ConflictResolution.resolveMostRecent(prov, functional)
      .as[(String, String, String, Long)].collect().toSet
    val b = ConflictResolution.resolveMostRecent(prov.repartition(7), functional)
      .as[(String, String, String, Long)].collect().toSet
    assert(a == b)
  }

  test("resolved output is conflict-free on the functional slice") {
    val out = ConflictResolution.resolveMostRecent(prov, functional)
    val dup = out.join(functional, Seq("pred"), "left_semi")
      .groupBy("subj", "pred").count().filter($"count" > 1).count()
    assert(dup == 0L)
  }
}
