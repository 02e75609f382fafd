package graft.plans

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties of the fused MinHash aggregation STATE (pure
  * JVM, no Spark): the update loop equals the brute per-permutation
  * minimum, split-merge invariance (the map-side-combine law), and
  * serde round-trip. Constants mirror the production derivation shape
  * (arbitrary a in [1, p), b in [0, p)).
  */
object MinHashProps extends Properties("MinHashSigs") {

  private val P = 2147483647L
  private val kGen = Gen.chooseNum(1, 32)
  private val hashes = Gen.listOf(Gen.chooseNum(0L, P - 1))

  private def consts(k: Int): (Seq[Long], Seq[Long]) = (
    (0 until k).map(i => 1L + (i.toLong * 2654435761L) % (P - 1)),
    (0 until k).map(i => (i.toLong * 40503L * 65537L) % P))

  private def agg(k: Int): MinHashSigs = {
    val (a, b) = consts(k)
    MinHashSigs(org.apache.spark.sql.catalyst.expressions.Literal(0L), a, b, P)
  }

  private def stateOf(m: MinHashSigs, hs: Seq[Long]): MinHashState = {
    // drive the update arithmetic directly (child eval is exercised by
    // the Spark specs; the state law is what distribution relies on)
    val s = m.createAggregationBuffer()
    val a = m.a.toArray; val b = m.b.toArray
    hs.foreach { h =>
      var i = 0
      while (i < s.mins.length) {
        val v = (h * a(i) + b(i)) % P
        if (v < s.mins(i)) s.mins(i) = v
        i += 1
      }
    }
    s
  }

  private def brute(m: MinHashSigs, hs: Seq[Long]): Seq[Long] =
    (0 until m.a.size).map { i =>
      if (hs.isEmpty) Long.MaxValue
      else hs.map(h => (h * m.a(i) + m.b(i)) % P).min
    }

  property("state equals the brute per-permutation minimum") =
    Prop.forAll(kGen, hashes) { (k, hs) =>
      val m = agg(k)
      stateOf(m, hs).mins.toSeq == brute(m, hs)
    }

  property("merge of any split equals the unsplit state") =
    Prop.forAll(kGen, hashes, Gen.chooseNum(0, 100)) { (k, hs, cut) =>
      val m = agg(k)
      val i = if (hs.isEmpty) 0 else cut % (hs.length + 1)
      val (l, r) = hs.splitAt(i)
      val merged = m.merge(stateOf(m, l), stateOf(m, r))
      merged.mins.toSeq == stateOf(m, hs).mins.toSeq
    }

  property("serialize/deserialize round-trips the state") =
    Prop.forAll(kGen, hashes) { (k, hs) =>
      val m = agg(k)
      val s = stateOf(m, hs)
      m.deserialize(m.serialize(s)).mins.toSeq == s.mins.toSeq
    }
}
