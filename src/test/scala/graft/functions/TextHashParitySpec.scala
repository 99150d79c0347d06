package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the native TextHash kernels (MinGramMd5Hex / WinnowFingerprints /
  * SimHashMd5) to the composed-column forms they replaced — the DuckDB
  * oracles were written against the composed forms, so equality here is
  * what keeps the oracle gate meaningful after the swap.
  */
class TextHashParitySpec extends SparkSpec {

  import graft.dedup.TextDedup.charShingles

  // ---- the original composed-column reference implementations ----

  private def minGramRef(c: Column, k: Int): Column =
    array_min(transform(charShingles(c, k), s => md5(s)))

  private def winnowRef(c: Column, k: Int, w: Int): Column = {
    val grams = transform(
      sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => c.substr(i, lit(k)))
    val hashes = transform(grams, g => conv(substring(md5(g), 1, 8), 16, 10).cast("long"))
    element_at(
      transform(array(hashes), hs =>
        array_sort(array_distinct(
          transform(sequence(lit(0), greatest(size(hs) - w, lit(0))),
            i => array_min(slice(hs, i + 1, lit(w))))))),
      1)
  }

  private def minHashBandsRef(c: Column, k: Int, bands: Int): Column = {
    val base = transform(charShingles(c, k), s => xxhash64(s))
    element_at(
      transform(array(base), bs =>
        array((0 until bands).map { b =>
          array_min(transform(bs, h => xxhash64(h, lit(b))))
        }: _*)),
      1)
  }

  private def simHashRef(c: Column, bits: Int): Column = {
    val hexChars = (bits + 3) / 4
    val toks = split(trim(c), """\s+""")
    val tokHashes = transform(toks, t => conv(substring(md5(t), 1, hexChars), 16, 10).cast("long"))
    val pows = array((0 until bits).map(i => lit(1L << i)): _*)
    val sums = aggregate(tokHashes, array_repeat(lit(0L), bits), (acc, h) =>
      zip_with(acc,
        transform(pows, p => when(h.bitwiseAND(p) =!= 0L, lit(1L)).otherwise(lit(-1L))),
        (a, b) => a + b))
    val bitStr = array_join(
      reverse(transform(sums, s => when(s > 0, lit("1")).otherwise(lit("0")))), "")
    conv(bitStr, 2, 10).cast("long")
  }

  // seeded corpus: alphanumerics with spaces and light punctuation
  private def randomTexts(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = ('a' to 'z') ++ ('0' to '9') ++ "      .,-"
    Seq.fill(n)(Seq.fill(rnd.nextInt(81))(alphabet(rnd.nextInt(alphabet.length))).mkString)
  }

  private def check(texts: Seq[String], native: Column => Column, ref: Column => Column): Unit = {
    val df = spark.createDataFrame(texts.map(Tuple1(_))).toDF("t")
    val rows = df.select(native(col("t")).as("a"), ref(col("t")).as("b")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.get(0) == r.get(1), s"mismatch on ${t.take(60).mkString}")
    }
  }

  private val edgeTexts = Seq("", " ", "  a  b ", "ab", "abcdefgh", "short",
    "the quick brown fox jumps over the lazy dog", "a\tb", "x " * 30,
    // non-BMP: gram boundaries must count CODE POINTS (Spark substr
    // semantics), never split a surrogate pair
    "ab😀cd efg 😁hij", "😀" * 10,
    "café naïve résumé")

  test("min_gram_md5 matches array_min(transform(md5)) on random text") {
    check(edgeTexts ++ randomTexts(1L, 200), TextHash.min_gram_md5(_, 8), minGramRef(_, 8))
  }

  test("winnow_fingerprints matches the composed sliding-window form") {
    for (w <- Seq(1, 2, 4, 7)) {
      check(edgeTexts ++ randomTexts(2L + w, 100),
        TextHash.winnow_fingerprints(_, 8, w), winnowRef(_, 8, w))
    }
  }

  test("minhash_bands matches the composed xxhash64 k-from-1 form") {
    for (bands <- Seq(1, 4, 8)) {
      check(edgeTexts ++ randomTexts(20L + bands, 100),
        TextHash.minhash_bands(_, 8, bands), minHashBandsRef(_, 8, bands))
    }
  }

  private def md5BandSigsRef(c: Column, k: Int, bands: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => array_min(transform(charShingles(c, k),
        s => md5(concat(b.cast("string"), lit(":"), s)))))

  test("md5_band_sigs matches the composed md5(b || ':' || gram) form") {
    for (bands <- Seq(1, 4, 6)) {
      check(edgeTexts ++ randomTexts(30L + bands, 100),
        TextHash.md5_band_sigs(_, 8, bands), md5BandSigsRef(_, 8, bands))
    }
  }

  test("simhash_md5 matches the array-accumulator composed form") {
    for (bits <- Seq(1, 32, 60)) {
      check(edgeTexts ++ randomTexts(10L + bits, 100),
        TextHash.simhash_md5(_, bits), simHashRef(_, bits))
    }
  }

  // ---- CMS bucket/estimate kernels (q121/q124/q132) ----

  private def cmsBucketRef(r: Int, c: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"$r:"), c)), 1, 8), 16, 10).cast("long") % width

  test("cms_buckets matches the composed conv(substring(md5)) % width per row") {
    for ((depth, width) <- Seq((4, 1024), (4, 16), (2, 7))) {
      check(edgeTexts ++ randomTexts(40L + depth * width, 150),
        TextHash.cms_buckets(_, depth, width),
        c => array((0 until depth).map(r => cmsBucketRef(r, c, width)): _*))
    }
  }

  test("md5_prefix_long matches conv(substring(md5(c), 1, n), 16, 10).cast(long)") {
    for (n <- Seq(1, 8, 12, 15)) {
      check(edgeTexts ++ randomTexts(70L + n, 150),
        TextHash.md5_prefix_long(_, n),
        c => conv(substring(md5(c), 1, n), 16, 10).cast("long"))
    }
  }

  test("cms_estimate matches least(element_at(cells, r*width + bucket + 1))") {
    val depth = 4
    val width = 16
    val rnd = new scala.util.Random(99L)
    val cells = Array.fill(depth * width)(rnd.nextInt(1000).toLong)
    check(edgeTexts ++ randomTexts(55L, 150),
      TextHash.cms_estimate(_, cells, depth, width),
      c => least((0 until depth).map(r =>
        element_at(typedlit(cells.toSeq),
          (cmsBucketRef(r, c, width) + (r * width + 1)).cast("int"))): _*))
  }
}
