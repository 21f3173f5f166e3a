package graft.functions

import org.apache.spark.sql.functions._
import graft.olhovivo.SparkTestBase

/** Every custom scalar expression's generated code must actually
  * COMPILE: Spark's default factory mode silently falls back to the
  * interpreted path on a codegen compile error (one WARN, then a 10×
  * slower expression forever). `CODEGEN_ONLY` turns the fallback into a
  * hard failure — this sweep drives each registered extension function
  * through a projection under that mode, so a broken `doGenCode` is a
  * red test, not a quiet slowdown. (This caught a real one: the string
  * quantile_rank emitted a JVM binary array name "[L...;" where Java
  * source syntax was required.)
  */
class CodegenOnlySpec extends SparkTestBase {
  import spark.implicits._

  private def codegenOnly[A](body: => A): A =
    SparkTestBase.sessionConfLock.synchronized {
      val saved = spark.conf.getOption("spark.sql.codegen.factoryMode")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      try body
      finally saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }

  test("haversine_m compiles and evaluates under CODEGEN_ONLY") {
    val m = codegenOnly {
      Seq((-23.55, -46.63, -23.56, -46.64)).toDF("a", "b", "c", "d")
        .select(call_function("haversine_m", $"a", $"b", $"c", $"d").as("m"))
        .head().getDouble(0)
    }
    assert(m > 1000 && m < 2500, s"unexpected haversine: $m")
  }

  test("dot_product compiles and evaluates under CODEGEN_ONLY") {
    val d = codegenOnly {
      Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("x", "y")
        .select(call_function("dot_product", $"x", $"y").as("d"))
        .head().getDouble(0)
    }
    assert(math.abs(d - 32.0) < 1e-6)
  }

  test("minhash_sig compiles and evaluates under CODEGEN_ONLY") {
    val sig = codegenOnly {
      Seq(Seq(11L, 22L, 33L)).toDF("h")
        .select(call_function("minhash_sig", $"h", lit(8)).as("s"))
        .head().getSeq[Long](0)
    }
    assert(sig.length == 8)
  }

  test("simhash64 compiles and evaluates under CODEGEN_ONLY") {
    val r = codegenOnly {
      Seq(Seq(11L, 22L, 33L)).toDF("h")
        .select(call_function("simhash64", $"h", lit(48)).as("s"))
        .head()
    }
    // deterministic for fixed input; the point is that the projection
    // compiled — just assert it produced a 48-bit value
    assert(!r.isNullAt(0) && (r.getLong(0) >>> 48) == 0L)
  }

  test("quantile_rank (double and string) compiles under CODEGEN_ONLY") {
    codegenOnly {
      val num = Seq(2.5).toDF("v")
        .select(call_function("quantile_rank", $"v",
          typedlit(Seq(1.0, 2.0, 3.0))).as("r")).head().getLong(0)
      assert(num == 2L)
      val str = Seq("cc").toDF("v")
        .select(call_function("quantile_rank", $"v",
          typedlit(Seq("bb", "dd"))).as("r")).head().getLong(0)
      assert(str == 1L)
    }
  }

  test("nearest_cid and nearest_cids compile and evaluate under CODEGEN_ONLY") {
    codegenOnly {
      val cents = typedlit(Seq(Seq(100000L, 200000L), Seq(0L, 0L)))
      val r = Seq(Array(0.1f, 0.2f)).toDF("v")
        .select(
          call_function("nearest_cid", $"v", cents).getField("cid").as("cid"),
          call_function("nearest_cids", $"v", cents, lit(2)).as("p"))
        .head()
      assert(r.getLong(0) == 0L)
      assert(r.getSeq[Long](1) == Seq(0L, 1L))
    }
  }

  test("winnow_fp compiles and evaluates under CODEGEN_ONLY") {
    val n = codegenOnly {
      Seq("the quick brown fox jumps over the lazy dog").toDF("t")
        .select(size(call_function("winnow_fp", $"t", lit(4), lit(3))).as("n"))
        .head().getInt(0)
    }
    assert(n > 0, s"expected fingerprints, got $n")
  }

  test("token_ngrams compiles and evaluates under CODEGEN_ONLY") {
    val n = codegenOnly {
      Seq("the quick brown fox jumps over the lazy dog").toDF("t")
        .select(size(call_function("token_ngrams", $"t", lit(5))).as("n"))
        .head().getInt(0)
    }
    assert(n == 5, s"expected 5 token 5-grams of 9 tokens, got $n")
  }

  test("idn_ascii compiles and evaluates under CODEGEN_ONLY") {
    val hosts = codegenOnly {
      Seq("bücher.example", "plain.example").toDF("h")
        .select(call_function("idn_ascii", $"h").as("a"))
        .as[String].collect().toSeq
    }
    assert(hosts == Seq("xn--bcher-kva.example", "plain.example"))
  }
  test("nfkc compiles and evaluates under CODEGEN_ONLY") {
    val out = codegenOnly {
      Seq("\ufb01le x\u00b2", "plain ascii").toDF("t")
        .select(call_function("nfkc", $"t").as("n"))
        .as[String].collect().toSeq
    }
    assert(out == Seq("file x2", "plain ascii"))
  }

}
