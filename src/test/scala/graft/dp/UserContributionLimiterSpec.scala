package graft.dp

import org.scalatest.funsuite.AnyFunSuite

class UserContributionLimiterSpec extends AnyFunSuite {

  test("admits up to C contributions per user, rejects afterwards") {
    val l = new UserContributionLimiter
    assert((1 to 3).forall(_ => l.allow("u1", 3L)))
    assert(!l.allow("u1", 3L))
    assert(l.userCount("u1") === 4L) // count tracks attempts, like the reference merge-then-compare
  }

  test("users are independent") {
    val l = new UserContributionLimiter
    (1 to 3).foreach(_ => l.allow("u1", 3L))
    assert(l.allow("u2", 3L))
  }

  test("null user: single allow is event-level (always true), batched allow admits 0") {
    val l = new UserContributionLimiter
    assert(l.allow(null, 1L))
    assert(l.allow(null, 5L, 10L) === 0L)
    assert(l.userCount(null) === 0L)
  }

  test("batched allow returns min(requested, remaining)") {
    val l = new UserContributionLimiter
    assert(l.allow("u", 10L, 32L) === 10L)
    assert(l.allow("u", 30L, 32L) === 22L)
    assert(l.allow("u", 5L, 32L) === 0L)
    assert(l.userCount("u") === 32L)
  }
}
