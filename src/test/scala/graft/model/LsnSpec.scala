package graft.model

import org.scalatest.funsuite.AnyFunSuite

class LsnSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private def nonNeg(): Long = rnd.nextLong() & Long.MaxValue

  test("golden: 30073823388 renders LSN(7,8a209c) (reference LsnTest.java:99-104)") {
    assert(Lsn(30073823388L).toLongString == "LSN(7,8a209c)")
    assert(Lsn(30073823388L).logUniq == 7L)
    assert(Lsn(30073823388L).logPos == 0x8a209cL)
  }

  test("compose/decompose round trip") {
    (1 to 500).foreach { _ =>
      val u = rnd.nextInt(Int.MaxValue).toLong
      val p = rnd.nextInt(Int.MaxValue).toLong
      val l = Lsn.of(u, p)
      assert(l.logUniq == u && l.logPos == p)
    }
  }

  test("NULL sorts before every available LSN") {
    assert(Lsn.Null < Lsn(0L))
    (1 to 500).foreach(_ => assert(Lsn.Null < Lsn(nonNeg())))
  }

  test("ordering isomorphic to value order") {
    (1 to 500).foreach { _ =>
      val a = nonNeg(); val b = nonNeg()
      assert((Lsn(a) < Lsn(b)) == (a < b))
    }
  }

  test("TxLogPosition total order: commitLsn then changeLsn (TxLogPosition.java:106-109)") {
    val p1 = TxLogPosition(Lsn(10), Lsn(5), 1, Lsn(1))
    val p2 = TxLogPosition(Lsn(10), Lsn(6), 2, Lsn(1))
    val p3 = TxLogPosition(Lsn(11), Lsn(0), 3, Lsn(1))
    assert(p1 < p2 && p2 < p3 && p1 < p3)
  }

  test("cloneAndSet never regresses (TxLogPosition.java:53-60)") {
    (1 to 500).foreach { _ =>
      val (c1, l1, c2, l2) = (nonNeg(), nonNeg(), nonNeg(), nonNeg())
      val p = TxLogPosition(Lsn(c1), Lsn(l1), 1, Lsn.Null)
      val q = p.cloneAndSet(Lsn(c2), Lsn(l2), 2, Lsn.Null)
      assert(q.commitLsn.value >= c1 && q.commitLsn.value >= c2)
      assert(q.changeLsn.value >= l1 && q.changeLsn.value >= l2)
    }
  }

  test("ChangeLogGen LSNs are strictly increasing within a transaction") {
    val cfg = graft.changelog.ChangeLogConfig(nTx = 50)
    (0L until 50L).foreach { i =>
      val recs = graft.changelog.ChangeLogGen.txRecords(cfg, i)
      assert(recs.map(_.lsn) == recs.map(_.lsn).sorted)
      assert(recs.head.op == "B")
      assert(Set("C", "R").contains(recs.last.op))
    }
  }

  test("ChangeLogGen LSNs are globally unique") {
    val cfg = graft.changelog.ChangeLogConfig(nTx = 200)
    val all = (0L until 200L).flatMap(i => graft.changelog.ChangeLogGen.txRecords(cfg, i))
    assert(all.map(_.lsn).distinct.size == all.size)
  }
}
