package graft.model

/** Log sequence number: a 64-bit position in the change log.
  *
  * Semantics re-created from the reference connector's LSN
  * (debezium-connector-informix `Lsn.java:54-134`):
  *   - `value = (logUniq << 32) | logPos` — the log-file unique id in
  *     the high 32 bits, the page-address within the file in the low 32.
  *   - a NULL / unavailable LSN sorts before every available LSN
  *     (`Lsn.java` NULL-smallest contract).
  *   - `toLongString` renders `LSN(logUniq,logPosHex)`; golden value from
  *     the reference unit test `LsnTest.java:99-104`:
  *     30073823388L -> "LSN(7,8a209c)".
  *
  * This is a plain value type used on the driver and in tests; inside
  * Spark plans LSNs travel as plain `LongType` columns so comparisons
  * stay codegen-friendly.
  */
final case class Lsn(value: Long) extends Ordered[Lsn] {
  def isAvailable: Boolean = value >= 0L
  def logUniq: Long = if (isAvailable) value >>> 32 else -1L
  def logPos: Long = if (isAvailable) value & 0xffffffffL else -1L

  /** NULL-smallest total order (reference `Lsn.java` compareTo). */
  override def compare(that: Lsn): Int = {
    val a = if (isAvailable) value else -1L
    val b = if (that.isAvailable) that.value else -1L
    java.lang.Long.compare(a, b)
  }

  def toLongString: String =
    if (!isAvailable) "NULL" else s"LSN($logUniq,${logPos.toHexString})"
}

object Lsn {
  val Null: Lsn = Lsn(-1L)
  /** Compose from (logUniq, logPos) — reference `Lsn.java:54-64`. */
  def of(logUniq: Long, logPos: Long): Lsn = Lsn((logUniq << 32) | (logPos & 0xffffffffL))
  def max(a: Lsn, b: Lsn): Lsn = if (a.compare(b) >= 0) a else b
}

/** Total-order position of an event in the transaction log.
  *
  * Re-creates the reference's `TxLogPosition.java:12-34`: "sequence
  * number is monotonically increasing in transaction but not across
  * transactions so the combination [commitLsn, changeLsn] is necessary
  * to get total order". Comparator: (commitLsn, changeLsn)
  * (`TxLogPosition.java:106-109`); `cloneAndSet` advances element-wise
  * so offsets never regress (`TxLogPosition.java:53-60`).
  */
final case class TxLogPosition(
    commitLsn: Lsn,
    changeLsn: Lsn,
    txId: Long,
    beginLsn: Lsn
) extends Ordered[TxLogPosition] {

  override def compare(that: TxLogPosition): Int = {
    val c = commitLsn.compare(that.commitLsn)
    if (c != 0) c else changeLsn.compare(that.changeLsn)
  }

  /** Monotone advance: element-wise max, never regress
    * (reference `TxLogPosition.java:53-60`).
    */
  def cloneAndSet(commit: Lsn, change: Lsn, tx: Long, begin: Lsn): TxLogPosition =
    TxLogPosition(
      Lsn.max(commitLsn, commit),
      Lsn.max(changeLsn, change),
      if (tx >= 0) tx else txId,
      Lsn.max(beginLsn, begin)
    )
}

object TxLogPosition {
  val Null: TxLogPosition = TxLogPosition(Lsn.Null, Lsn.Null, -1L, Lsn.Null)
  def valueOf(commit: Lsn): TxLogPosition = TxLogPosition(commit, Lsn.Null, -1L, Lsn.Null)
}
