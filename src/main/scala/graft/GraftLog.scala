package graft

/** The benign-event logging chokepoint. Expected-race and
  * benign-backpressure notices — lost maintenance intervals, compaction
  * replace-race / basis skips, dict-fold read-basis retries, commit-guard
  * contention — are RECORDED in the maintainer ops census when one is
  * wired ([[graft.streaming.IndexMaintain.census]]): that table is the
  * source of truth an operator queries. stderr only ECHOES them when
  * `-Dgraft.verbose=true` (or env `GRAFT_VERBOSE=true`) is set, so a
  * healthy high-churn maintainer does not spray its console with
  * by-design events. Exceptional conditions that have NO census row
  * (possible corruption, skipped recovery, a failed census write itself)
  * stay on stderr unconditionally. */
private[graft] object GraftLog {
  private val on: Boolean =
    sys.props.get("graft.verbose").orElse(sys.env.get("GRAFT_VERBOSE"))
      .exists(_.equalsIgnoreCase("true"))
  def debug(msg: => String): Unit = if (on) System.err.println(msg)
}
