package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.olhovivo.SparkTestBase

/** FastSS fuzzy matching: deletion-neighborhood contents, edge lengths,
  * and — the load-bearing property — candidate completeness: the
  * neighborhood join must find EVERY pair the brute-force distance
  * check finds. */
class FuzzySpec extends SparkTestBase {
  import spark.implicits._

  private def variantsOf(s: String, k: Int): Set[String] =
    Seq((1L, s)).toDF("id", "t")
      .select(Fuzzy.deletionVariants($"t", k)).head().getSeq[String](0).toSet

  test("deletionVariants: exact neighborhood for abc; edge lengths 0 and 1") {
    assert(variantsOf("abc", 1) == Set("abc", "bc", "ac", "ab"))
    assert(variantsOf("abc", 2) == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(variantsOf("a", 2) == Set("a", ""))
    assert(variantsOf("", 2) == Set(""))
    // duplicate-char deletions collapse ("aa" → "a" twice)
    assert(variantsOf("aa", 1) == Set("aa", "a"))
  }

  test("fuzzyPairs: known pairs at k=1 and k=2, ordered a < b") {
    val df = Seq("cat", "cart", "dog", "dig", "car").toDF("t")
    val k1 = Fuzzy.fuzzyPairs(df, $"t", 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(k1 == Set(("car", "cart", 1L), ("car", "cat", 1L),
      ("cart", "cat", 1L), ("dig", "dog", 1L)), s"got $k1")
    val k2 = Fuzzy.fuzzyPairs(df, $"t", 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(k2.contains(("cart", "cat")) && k2.contains(("car", "cart")))
    assert(!k2.contains(("cat", "dog"))) // dist 3
  }

  // plain DP levenshtein as the test oracle
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteForceCheck(k: Int, alphabet: Seq[Char], maxLen: Int,
                              count: Int, seedBase: Long): Unit = {
    val params = Gen.Parameters.default
    val g = Gen.choose(0, maxLen).flatMap(n => Gen.listOfN(n, Gen.oneOf(alphabet)))
      .map(_.mkString)
    val vocab = (0 until count).flatMap(i => g.apply(params, Seed(seedBase + i))).distinct
    val got = Fuzzy.fuzzyPairs(vocab.toDF("t"), $"t", k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = (for {
      a <- vocab; b <- vocab if a < b
      d = lev(a, b) if d <= k
    } yield (a, b, d.toLong)).toSet
    assert(got == want, s"k=$k missing=${want -- got} extra=${got -- want}")
  }

  test("fuzzyPairs k=1 ≡ brute force on a dense random vocabulary") {
    bruteForceCheck(1, Seq('a', 'b', 'c'), maxLen = 4, count = 80, seedBase = 1000L)
  }

  test("fuzzyPairs k=2 ≡ brute force on a dense random vocabulary") {
    bruteForceCheck(2, Seq('a', 'b'), maxLen = 5, count = 60, seedBase = 0L)
  }
}
