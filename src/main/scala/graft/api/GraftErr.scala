package graft.api

/** Stackless, code-classed error for the failable-UDF error channel.
  *
  * The reference engine's exceptions are i64 codes with no stack traces
  * (tuplex/utils/include/ExceptionCodes.h:156-233) — a thrown row costs a
  * tag write, not a stack walk. A plain JVM exception pays
  * `fillInStackTrace` at construction (a full stack walk per throw), which
  * at sf10 is ~20 s of pure trace construction for q_flights_golden's
  * ~12M planted throws. `GraftErr` reproduces the reference's semantics
  * (code-classed, traceless, carries an optional message) AND its cost
  * profile: the 4-arg `RuntimeException` constructor disables both stack
  * capture and suppression, and message-less codes reuse a cached
  * singleton so the hot path allocates nothing.
  *
  * Error-channel encoding: a captured `GraftErr` records its class as
  * `"graft.api.GraftErr:<code>"` in the `_g_err_cls` column, so
  *   - `resolveCode(code)` / `ignoreCode(code)` match one code exactly,
  *   - `resolve(classOf[GraftErr])` matches every code (prefix match),
  *   - `exceptionCounts` reports per-code tallies — the reference's
  *     per-ExceptionCode counters, not one merged JVM-class bucket.
  */
final class GraftErr(val code: Long, msg: String)
    extends RuntimeException(msg, null, false, false) {
  // Per-instance caches: the hot path rethrows one cached singleton per
  // code, so the error-channel encoding (class tag + default message)
  // must not re-concatenate strings per thrown row — at sf10 the goldens
  // throw ~12M rows per pass.
  private[api] val clsTag: String = GraftErr.ClassName + ":" + code
  private val defaultMsg: String = "code " + code
  override def getMessage: String =
    if (super.getMessage == null) defaultMsg else super.getMessage
}

object GraftErr {
  val ClassName: String = classOf[GraftErr].getName

  /** Error-channel class tag for a code (what `_g_err_cls` stores). */
  def clsName(code: Long): String = ClassName + ":" + code

  // message-less codes are immutable and traceless → safe to reuse; the
  // planted-error hot path then allocates zero objects per thrown row
  private val cached = new java.util.concurrent.ConcurrentHashMap[Long, GraftErr]()

  /** Fast-path row failure: throw the cached stackless error for `code`.
    * This is the idiomatic way for user UDFs to divert a row to the
    * error channel at reference-engine cost. */
  def fail(code: Long): Nothing =
    throw cached.computeIfAbsent(code, c => new GraftErr(c, null))

  /** Row failure with a per-row message (allocates, still stackless). */
  def fail(code: Long, msg: String): Nothing = throw new GraftErr(code, msg)

  def apply(code: Long, msg: String = null): GraftErr = new GraftErr(code, msg)
}
