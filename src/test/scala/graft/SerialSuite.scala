package graft

import org.scalatest.Outcome
import org.scalatest.funsuite.AnyFunSuite

/** Mix-in for suites that must not run concurrently with ANY other
  * query-building suite (r13, suite parallelization):
  *
  *  - they mutate SHARED session conf (AQE toggles, CBO flags,
  *    broadcast thresholds) with try/finally restore, and/or
  *  - they assert on COLD-CACHE physical plan structure (exchange
  *    counts, pruning scans), which a concurrent suite merely
  *    CONSTRUCTING a graded query can corrupt — operator code calls
  *    .persist() during construction, registering entries in the
  *    context-global CacheManager that substitute InMemoryRelations
  *    into every later matching plan.
  *
  * Two layers of isolation: build.sbt assigns these suites (by FQCN
  * — keep `serialSuites` there in sync with the extends clauses) to
  * their own forked JVM, away from the parallel group's constructions
  * entirely; and this lock serializes them against EACH OTHER inside
  * that JVM, since `testForkedParallel` applies to every group.
  */
trait SerialSuite extends AnyFunSuite {
  abstract override def withFixture(test: NoArgTest): Outcome =
    SerialSuite.lock.synchronized { super.withFixture(test) }
}

object SerialSuite {
  val lock = new Object
}
