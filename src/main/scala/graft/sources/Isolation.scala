package graft.sources

/** Isolation-level negotiation — port of the reference's downgrade logic
  * (reference: ExtJdbcUtils.scala:193-216): the requested level is used
  * only if the target supports it; otherwise fall back to the strongest
  * supported level at or below the request, else NONE. The reference ran
  * this against JDBC `DatabaseMetaData`; here the "supported" set is a
  * capability the sink target declares (a filesystem sink supports only
  * NONE — each task file appears atomically on rename — which is exactly
  * why the compensating-delete protocol exists on top).
  */
object Isolation extends Enumeration {
  val None_, ReadUncommitted, ReadCommitted, RepeatableRead, Serializable_ =
    Value

  /** Strongest supported level <= requested, else NONE. */
  def negotiate(requested: Value, supported: Set[Value]): Value = {
    if (supported.contains(requested)) requested
    else values.toSeq.reverse
      .find(v => v < requested && supported.contains(v))
      .getOrElse(None_)
  }
}
