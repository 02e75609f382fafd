package graft.plans

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties of the Misra-Gries heavy-hitter STATE (pure
  * JVM, no Spark): the frequency guarantee (every item with true
  * frequency > N/(k+1) survives), the counter error bound, both under
  * ARBITRARY split/merge trees (the mergeable-summaries law the
  * distributed aggregate relies on), and serde round-trip.
  */
object MgProps extends Properties("MisraGries") {

  private val kGen = Gen.chooseNum(1, 32)
  // skew-heavy alphabet so heavy items actually occur
  private val itemGen = Gen.frequency(
    4 -> Gen.const("h1"), 3 -> Gen.const("h2"), 2 -> Gen.const("h3"),
    6 -> Gen.chooseNum(0, 200).map(i => s"c$i"))
  private val streams = Gen.listOf(itemGen)

  private def stateOf(k: Int, xs: Seq[String]): MgState = {
    val s = new MgState(k)
    xs.foreach(x => s.add(x))
    s
  }

  private def counts(s: MgState): Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    val it = s.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  private def truth(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  // random split into chunks, then left-fold merge of the chunk states
  private def mergedState(k: Int, xs: Seq[String], chunks: Int): MgState = {
    val size = math.max(1, xs.length / math.max(1, chunks))
    xs.grouped(size).map(stateOf(k, _)).reduceOption { (a, b) =>
      val it = b.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = a.counts.get(e.getKey)
        a.counts.put(e.getKey, cur + e.getValue)
      }
      a.shrink()
      a
    }.getOrElse(new MgState(k))
  }

  property("guarantee: freq > N/(k+1) items always survive a single pass") =
    Prop.forAll(kGen, streams) { (k, xs) =>
      val n = xs.length.toLong
      val heavy = truth(xs).filter { case (_, c) => c * (k + 1) > n }.keySet
      heavy.subsetOf(counts(stateOf(k, xs)).keySet)
    }

  property("guarantee + error bound hold under any split/merge tree") =
    Prop.forAll(kGen, streams, Gen.chooseNum(1, 9)) { (k, xs, chunks) =>
      val n = xs.length.toLong
      val t = truth(xs)
      val got = counts(mergedState(k, xs, chunks))
      val heavy = t.filter { case (_, c) => c * (k + 1) > n }.keySet
      val guarantee = heavy.subsetOf(got.keySet)
      // every retained counter underestimates by at most N/(k+1)
      val bound = got.forall { case (x, c) =>
        val f = t.getOrElse(x, 0L)
        c <= f && (f - c) * (k + 1) <= n // f - c <= N/(k+1)
      }
      guarantee && bound
    }

  property("state size never exceeds k") =
    Prop.forAll(kGen, streams, Gen.chooseNum(1, 9)) { (k, xs, chunks) =>
      counts(mergedState(k, xs, chunks)).size <= k
    }

  property("serialize/deserialize round trip") =
    Prop.forAll(kGen, streams) { (k, xs) =>
      val agg = MisraGries(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString("x")), k)
      val s = stateOf(k, xs)
      counts(agg.deserialize(agg.serialize(s))) == counts(s)
    }
}
