package graft.plans

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties of the KMV sketch STATE (pure JVM, no Spark):
  * bottom-k correctness, split-merge invariance (the law map-side
  * combine + shuffle merge relies on), and serde round-trip — the three
  * invariants the distributed aggregate's correctness reduces to.
  */
object KmvProps extends Properties("KmvSketch") {

  private val kGen = Gen.chooseNum(2, 64)
  private val hashes = Gen.listOf(Gen.chooseNum(0L, (1L << 56) - 1))

  private def stateOf(k: Int, hs: Seq[Long]): KmvState = {
    val s = new KmvState(k)
    hs.foreach(s.add)
    s
  }

  private def values(s: KmvState): List[Long] = {
    val b = List.newBuilder[Long]
    val it = s.mins.iterator()
    while (it.hasNext) b += it.next()
    b.result()
  }

  property("state holds exactly the k smallest distinct values") =
    Prop.forAll(kGen, hashes) { (k, hs) =>
      values(stateOf(k, hs)) == hs.distinct.sorted.take(k)
    }

  property("merge of any split equals the unsplit state") =
    Prop.forAll(kGen, hashes, Gen.chooseNum(0, 100)) { (k, hs, cut) =>
      val i = if (hs.isEmpty) 0 else cut % (hs.length + 1)
      val (l, r) = hs.splitAt(i)
      val merged = {
        val a = stateOf(k, l)
        val it = stateOf(k, r).mins.iterator()
        while (it.hasNext) a.add(it.next())
        a
      }
      values(merged) == values(stateOf(k, hs))
    }

  property("serialize/deserialize round trip") =
    Prop.forAll(kGen, hashes) { (k, hs) =>
      val agg = KmvSketch(org.apache.spark.sql.catalyst.expressions.Literal(0L), k)
      val s = stateOf(k, hs)
      values(agg.deserialize(agg.serialize(s))) == values(s)
    }
}
