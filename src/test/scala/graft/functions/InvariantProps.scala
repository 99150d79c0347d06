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

  // Keywords must start/end on word characters (as the reference's lists
  // do) — \b against a trailing ')' is legitimately not a boundary.
  property("keywordRegex quotes regex metacharacters") =
    Prop.forAllNoShrink(Gen.oneOf("a+b", "c(d)e", "e.f", "g|h")) { kw =>
      val re = graft.cva.CvaPipeline.keywordRegex(Seq(kw))
      val p = java.util.regex.Pattern.compile(re)
      p.matcher(s"x $kw y").find() && !p.matcher("x unrelated y").find()
    }
}
