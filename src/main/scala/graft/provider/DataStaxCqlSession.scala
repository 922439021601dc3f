package graft.provider

/** Production adapter for [[CqlSessionLike]] over the DataStax Java
  * driver 4.x — shipped as DOCUMENTED SOURCE: this build environment is
  * offline (no driver jar, no cluster), so the adapter body cannot
  * compile here; the snippet below is the complete, copy-paste-ready
  * implementation against the public `com.datastax.oss` API, and every
  * part of its contract that IS checkable offline — the consistency
  * names and the bind-value types the binding hands the seam — is
  * compiled and spec-pinned in this object (DataStaxAdapterSpec drives
  * the full statement surface of [[CqlDedupLog]] through [[accepts]]),
  * so the snippet cannot silently drift from the binding.
  *
  * == Adapter source (compile with `java-driver-core` 4.x) ==
  * {{{
  * package graft.provider
  *
  * import com.datastax.oss.driver.api.core.{CqlSession, DefaultConsistencyLevel}
  * import com.datastax.oss.driver.api.core.cql.SimpleStatement
  * import scala.jdk.CollectionConverters._
  *
  * /** Close over a real driver session:
  *   *   val log = new CqlDedupLog(new DataStaxCqlSession(session))
  *   * Statement texts, per-kind consistency, execution profile,
  *   * DDL-on-first-miss and the protocol invariants all come from the
  *   * binding — the adapter only maps the seam onto the driver API.
  *   */
  * final class DataStaxCqlSession(session: CqlSession) extends CqlSessionLike {
  *   override def execute(stmt: CqlStatement,
  *                        params: Map[String, Any]): CqlResult = {
  *     // Named binds go through the BUILDER's addNamedValue(String,
  *     // Object) — the bulk setter setNamedValuesWithIds lives on the
  *     // built SimpleStatement and is keyed by CqlIdentifier, not
  *     // String, so folding the per-entry builder method is both the
  *     // 4.x-idiomatic shape and the one that compiles as written.
  *     val built = params
  *       .foldLeft(
  *         SimpleStatement.builder(stmt.cql)
  *           .setExecutionProfileName(stmt.profileName)
  *           .setConsistencyLevel(
  *             DefaultConsistencyLevel.valueOf(stmt.consistency))) {
  *         case (b, (k, v)) => b.addNamedValue(k, v.asInstanceOf[AnyRef])
  *       }
  *       .build()
  *     val rs = session.execute(built)
  *     val cols = rs.getColumnDefinitions.asScala
  *       .map(_.getName.asInternal).toSeq
  *     val rows = rs.asScala.map { row =>
  *       cols.map(c => c -> row.getObject(c)).toMap
  *     }.toSeq
  *     CqlResult(rows, rs.wasApplied())
  *   }
  * }
  * }}}
  *
  * Why `row.getObject` round-trips the binding's values: the driver's
  * default codecs map `text → java.lang.String`, `timeuuid →
  * java.util.UUID`, `smallint → java.lang.Short`, `int →
  * java.lang.Integer` — exactly the types [[CqlDedupLog]] reads back
  * from [[CqlResult]] rows (`time_uuid.asInstanceOf[UUID]`,
  * `state.asInstanceOf[Short]`, `ttl_remaining.asInstanceOf[Int]`).
  * On the bind side, boxing `Any` to `AnyRef` produces the same four
  * classes, all driver-codec bindable ([[bindable]] is the compiled
  * statement of that table).
  *
  * TCK: certify a real deployment by subclassing the contract spec
  * exactly as `CqlDedupLogContractSpec` does with the in-memory
  * session —
  * {{{
  * class RealClusterContractSpec extends DedupLogContractSpec {
  *   private val session = CqlSession.builder().build()
  *   override val log = new CqlDedupLog(new DataStaxCqlSession(session))
  *   // time-stepped tests need the cluster's clock; see the spec's
  *   // SteppedClock notes for which cases to gate on wall time
  * }
  * }}}
  */
object DataStaxCqlSession {

  /** `DefaultConsistencyLevel`'s public names (java-driver-core 4.x) —
    * the set `valueOf` in the snippet accepts.
    */
  val DriverConsistencyNames: Set[String] = Set(
    "ANY", "ONE", "TWO", "THREE", "QUORUM", "ALL",
    "LOCAL_ONE", "LOCAL_QUORUM", "EACH_QUORUM", "SERIAL", "LOCAL_SERIAL")

  /** Bind-value types the driver's default codecs accept for the
    * binding's columns: text (String), timeuuid (UUID), smallint
    * (Short), int TTL (Int). Anything else would throw in
    * `addNamedValue`'s codec lookup at execute — compiled here so the
    * binding can't grow a bind the documented adapter couldn't map.
    */
  def bindable(v: Any): Boolean = v match {
    case _: String | _: java.util.UUID | _: Short | _: Int => true
    case _ => false
  }

  /** The offline half of the adapter contract: every statement the
    * binding hands a session must carry a driver-enumerable consistency
    * level, a non-empty profile name, and only codec-mappable bind
    * values.
    */
  def accepts(stmt: CqlStatement, params: Map[String, Any]): Boolean =
    DriverConsistencyNames.contains(stmt.consistency) &&
      stmt.profileName.nonEmpty &&
      params.valuesIterator.forall(bindable)
}
