package graft.model

import org.scalacheck.{Gen, Prop, Properties}
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.stream.ReplayOracle

/** ScalaCheck property suites over the pure model (no Spark session):
  * LSN total order and the sequential replay oracle's invariants.
  */
object LsnProps extends Properties("Lsn") {

  private val nonNeg = Gen.chooseNum(0L, Long.MaxValue - 1)

  property("ordering isomorphic to value order") =
    Prop.forAll(nonNeg, nonNeg) { (a, b) => (Lsn(a) < Lsn(b)) == (a < b) }

  property("compose-decompose round trip") =
    Prop.forAll(Gen.chooseNum(0L, 0x7fffffffL), Gen.chooseNum(0L, 0xffffffffL)) {
      (u, p) => val l = Lsn.of(u, p); l.logUniq == u && l.logPos == p
    }

  property("NULL is the minimum") =
    Prop.forAll(nonNeg) { v => Lsn.Null < Lsn(v) }

  property("cloneAndSet is monotone and idempotent") =
    Prop.forAll(nonNeg, nonNeg, nonNeg, nonNeg) { (c1, l1, c2, l2) =>
      val p = TxLogPosition(Lsn(c1), Lsn(l1), 1, Lsn.Null)
      val q = p.cloneAndSet(Lsn(c2), Lsn(l2), 2, Lsn.Null)
      val r = q.cloneAndSet(Lsn(c2), Lsn(l2), 2, Lsn.Null)
      q.commitLsn.value >= math.max(c1, c2) &&
        q.changeLsn.value >= math.max(l1, l2) && q == r
    }
}

/** Generator/oracle properties: deterministic regeneration, replay-skip
  * monotonicity, rollback isolation.
  */
object ReplayProps extends Properties("Replay") {

  private val seeds = Gen.chooseNum(1L, 1000000L)

  property("generator is deterministic per seed") = Prop.forAll(seeds) { s =>
    val cfg = ChangeLogConfig(seed = s, nTx = 20, nDocs = 10)
    val a = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
    val b = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
    a == b
  }

  property("replay-skip at lsn L drops exactly the txs committed at or before L") =
    Prop.forAll(seeds) { s =>
      val cfg = ChangeLogConfig(seed = s, nTx = 30, nDocs = 15)
      val log = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
      val commits = log.filter(_.op == "C").map(_.lsn).sorted
      val mid = commits(commits.size / 2)
      val full = ReplayOracle.replay(Map.empty, log, mid)
      // applying only the txs with commit > mid gives the same state
      val lateTxs = log.filter(_.op == "C").filter(_.lsn > mid).map(_.tx_id).toSet
      val lateOnly = log.filter(r => lateTxs.contains(r.tx_id))
      full == ReplayOracle.replay(Map.empty, lateOnly, -1L)
    }

  property("rolled-back transactions never affect state") = Prop.forAll(seeds) { s =>
    val cfg = ChangeLogConfig(seed = s, nTx = 30, nDocs = 15, rollbackPct = 50)
    val log = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
    val rolled = log.filter(_.op == "R").map(_.tx_id).toSet
    val withRb = ReplayOracle.replay(Map.empty, log, -1L)
    val withoutRb = ReplayOracle.replay(Map.empty,
      log.filterNot(r => rolled.contains(r.tx_id)), -1L)
    withRb == withoutRb
  }
}
