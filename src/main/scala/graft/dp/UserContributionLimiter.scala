package graft.dp

import scala.collection.mutable

/** Per-user contribution limiter enforcing the hard C bound that keeps the
  * user-level L1 sensitivity at C · L_m (DP-SQLP §3.2). Behavioral port of
  * confidentialstorm/enclave/.../dp/UserContributionLimiter.java:22-66.
  *
  * In the distributed engine this logic runs inside keyed state (grouped by
  * user) or, in batch mode, as `row_number() over (partition by user)` — this
  * class is the single-node reference and the streaming state payload.
  */
final class UserContributionLimiter extends Serializable {
  private val counts = mutable.HashMap.empty[String, Long]

  /** Admit one contribution. Null user ⇒ event-level privacy: always allowed. */
  def allow(userId: String, maxContributions: Long): Boolean = {
    if (userId == null) return true
    val c = counts.getOrElse(userId, 0L) + 1
    counts.update(userId, c)
    c <= maxContributions
  }

  /** Admit up to `contributions` at once; returns how many were accepted
    * (min(requested, C − used), 0 once exhausted). Null user ⇒ 0, matching
    * the reference's batched overload. */
  def allow(userId: String, contributions: Long, maxContributions: Long): Long = {
    if (userId == null) return 0L
    val current = counts.getOrElse(userId, 0L)
    val remaining = maxContributions - current
    if (remaining <= 0) 0L
    else {
      val accepted = math.min(contributions, remaining)
      counts.update(userId, current + accepted)
      accepted
    }
  }

  def userCount(userId: String): Long =
    if (userId == null) 0L else counts.getOrElse(userId, 0L)
}
