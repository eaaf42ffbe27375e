package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.index.PropertyIndexBuilder
import graft.model.RawProperty
import graft.oracle.ReferenceOracle

class PropertyIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def runSpark(rows: Seq[RawProperty]): Set[(String, String, Int)] = {
    import spark.implicits._
    PropertyIndexBuilder.build(rows.toDF())
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
  }

  val genProps: Gen[Seq[RawProperty]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.sequence[Seq[RawProperty], RawProperty]((0 until n).map { i =>
      for {
        label <- Gen.oneOf((0 until 6).map(j => s"rel$j"))
        count <- Gen.choose(0L, 9L) // ties on purpose: first input row must win
        nAliases <- Gen.choose(0, 3)
        aliases <- Gen.listOfN(nAliases,
          Gen.oneOf((0 until 8).map(j => s"pa$j") ++ (0 until 6).map(j => s"rel$j")))
        nInv <- Gen.choose(0, 2)
        inverses <- Gen.listOfN(nInv, Gen.choose(1, n).map(k => s"P$k"))
      } yield RawProperty(s"P${i + 1}", label, count, aliases, inverses, i.toLong)
    })
  } yield rows

  def sample[T](gen: Gen[T], seed: Long): T = gen(Gen.Parameters.default, Seed(seed)).get

  test("spark property index == reference oracle (property-based)") {
    for (seed <- 1L to 15L) {
      val rows = sample(genProps, seed)
      val got = runSpark(rows)
      val want = ReferenceOracle.propertyIndex(rows)
      assert(got == want, s"\nseed=$seed rows=$rows\nonly-spark=${got -- want}\nonly-oracle=${want -- got}")
    }
  }

  test("hand-built: A5 count-tie keeps first input row; A7 vacancy") {
    val rows = Seq(
      RawProperty("P1", "spouse", 5, Seq("married to", "partner"), Nil, 0),
      RawProperty("P2", "spouse", 5, Seq("husband"), Nil, 1), // tie → P1 wins
      RawProperty("P3", "partner", 9, Seq("partner"), Nil, 2)) // label takes "partner"
    val got = runSpark(rows)
    assert(got.contains(("spouse", "P1", 0)))
    assert(got.contains(("partner", "P3", 0)))
    // "partner" as alias: occurs twice (P1, P3) → not unique → dropped;
    // "married to"/"husband" unique & vacant → promoted
    assert(got.contains(("married to", "P1", 1)))
    assert(got.contains(("husband", "P2", 1)))
    assert(!got.exists(e => e._1 == "partner" && e._3 == 1))
    assert(got == ReferenceOracle.propertyIndex(rows))
  }

  test("qualifier expansion emits 5 variants per surface (P11)") {
    import spark.implicits._
    val rows = Seq(RawProperty("P1", "spouse", 5, Nil, Nil, 0))
    val idx = PropertyIndexBuilder.build(rows.toDF())
    val out = PropertyIndexBuilder.outputRows(idx, includeWikidataQualifiers = true)
    val got = out.collect().map(r => (r.getString(1), r.getSeq[String](3))).toMap
    assert(got(null) == Seq("spouse"))
    assert(got("p") == Seq("spouse (statement)"))
    assert(got("pq") == Seq("spouse (qualifier)"))
    assert(got("pqn") == Seq("spouse (normalized qualifier)"))
    assert(got("ps") == Seq("spouse (value)"))
    assert(got("psn") == Seq("spouse (normalized value)"))
  }

  test("inverse pairs only for indexed pids") {
    import spark.implicits._
    val rows = Seq(
      RawProperty("P1", "x", 5, Nil, Seq("P2"), 0),
      RawProperty("P2", "x", 3, Nil, Seq("P1"), 1)) // P2 loses label, no alias → absent
    val idx = PropertyIndexBuilder.build(rows.toDF())
    val inv = PropertyIndexBuilder.inversePairs(rows.toDF(), idx)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(inv == Set(("P1", "P2")))
  }
}
