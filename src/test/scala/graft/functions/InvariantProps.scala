package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck invariants for the pure-JVM kernels (SURVEY §5.2).
  * Runs under sbt's ScalaCheck framework — no Spark session needed. */
object InvariantProps extends Properties("graft.invariants") {
  private val word = Gen.alphaLowerStr.map(_.take(12))

  property("osa: identity ⇒ 0") = Prop.forAll(word) { s =>
    OsaDistance.osa(s, s) == 0
  }

  property("osa: symmetric") = Prop.forAll(word, word) { (a, b) =>
    OsaDistance.osa(a, b) == OsaDistance.osa(b, a)
  }

  property("osa: bounded by max length") = Prop.forAll(word, word) { (a, b) =>
    OsaDistance.osa(a, b) <= math.max(a.length, b.length)
  }

  property("osa: adjacent transposition costs exactly 1") =
    Prop.forAll(word.suchThat(s => s.length >= 2)) { s =>
      val i = s.length / 2 - 1
      val t = s.updated(i, s(i + 1)).updated(i + 1, s(i))
      val d = OsaDistance.osa(s, t)
      (t == s && d == 0) || d == 1
    }

  property("osa: single substitution costs ≤ 1") =
    Prop.forAll(word.suchThat(_.nonEmpty)) { s =>
      OsaDistance.osa(s, s.updated(0, if (s(0) == 'z') 'a' else 'z')) == 1
    }

  property("osa counts code points: non-BMP substitution and transposition cost 1") =
    Prop.forAll(word) { s =>
      val grin = "😀" // U+1F600
      val wink = "😉" // U+1F609
      OsaDistance.osa(s + grin, s + wink) == 1 &&
        OsaDistance.osa(grin + wink + s, wink + grin + s) == 1 &&
        OsaDistance.osa(s + grin, s) == 1 // one code point = one deletion
    }

  // Keywords must start/end on word characters (as the reference's lists
  // do) — \b against a trailing ')' is legitimately not a boundary.
  property("keywordRegex quotes regex metacharacters") =
    Prop.forAllNoShrink(Gen.oneOf("a+b", "c(d)e", "e.f", "g|h")) { kw =>
      val re = graft.cva.CvaPipeline.keywordRegex(Seq(kw))
      val p = java.util.regex.Pattern.compile(re)
      p.matcher(s"x $kw y").find() && !p.matcher("x unrelated y").find()
    }

  // ---- TextHash kernel invariants (pure JVM, no Spark session) ----

  import org.apache.spark.unsafe.types.UTF8String
  private val text = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar, 3 -> Gen.const(' '))).map(_.mkString.take(60))

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }
  private def grams(s: String, k: Int): Seq[String] = {
    val n = math.max(s.length - k + 1, 1)
    (0 until n).map(i => s.substring(i, math.min(i + k, s.length)))
  }

  property("minGramMd5 == brute-force min of gram md5 hex") =
    Prop.forAll(text) { s =>
      TextHash.minGramMd5(UTF8String.fromString(s), 8).toString ==
        grams(s, 8).map(md5Hex).min
    }

  property("winnow: sorted, distinct, subset of gram hashes; w=1 = all hashes") =
    Prop.forAll(text) { s =>
      def hash32(g: String) = java.lang.Long.parseLong(md5Hex(g).take(8), 16)
      val all = grams(s, 8).map(hash32)
      val out = TextHash.winnow(UTF8String.fromString(s), 8, 4).toLongArray.toSeq
      val w1 = TextHash.winnow(UTF8String.fromString(s), 8, 1).toLongArray.toSeq
      out == out.sorted && out.distinct == out &&
        out.forall(all.contains) && out.nonEmpty &&
        w1 == all.distinct.sorted
    }

  property("simHash of a single token == its md5-prefix hash") =
    Prop.forAll(Gen.alphaLowerStr.map(_.take(10)).suchThat(_.nonEmpty)) { t =>
      TextHash.simHash(UTF8String.fromString(t), 60) ==
        java.lang.Long.parseLong(md5Hex(t).take(15), 16)
    }

  property("simHash stays inside its bit width") =
    Prop.forAll(text, Gen.oneOf(1, 8, 32, 60)) { (s, bits) =>
      val sig = TextHash.simHash(UTF8String.fromString(s), bits)
      sig >= 0 && (bits == 60 || sig < (1L << bits))
    }

  property("minHashBands: band count and per-band minimality") =
    Prop.forAll(text) { s =>
      import org.apache.spark.sql.catalyst.expressions.XXH64
      val out = TextHash.minHashBands(UTF8String.fromString(s), 8, 4).toLongArray
      val expected = (0 until 4).map { b =>
        grams(s, 8).map { g =>
          val base = XXH64.hashUTF8String(UTF8String.fromString(g), 42L)
          XXH64.hashInt(b, XXH64.hashLong(base, 42L))
        }.min
      }
      out.toSeq == expected
    }
}
