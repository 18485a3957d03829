package graft

import graft.functions.{MinHashSig, ShingleHashes}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("shingle_hashes: one-pass rolling hashes equal per-substring hashing") {
    val texts = Seq("hello world foo bar", "abc", "", "aa")
    val got = texts.toDF("t").select(ShingleHashes($"t", 3).as("h"))
      .as[Seq[Long]].collect()
    // reference implementation in plain scala
    def ref(s: String, k: Int): Seq[Long] = {
      val b = s.getBytes("UTF-8")
      if (b.isEmpty) Nil
      else if (b.length <= k) Seq(refHashAll(b))
      else (0 to b.length - k).map(i => refHashAll(b.slice(i, i + k))).distinct.sorted
    }
    def refHashAll(b: Array[Byte]): Long = {
      var h = 0L
      b.foreach(x => h = h * 0x100000001b3L + (x & 0xFFL))
      fmix(h)
    }
    def fmix(h0: Long): Long = {
      var h = h0
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33; h
    }
    texts.zip(got).foreach { case (t, hs) =>
      assert(hs.toSeq == ref(t, 3), s"mismatch for '$t'")
    }
  }

  test("shingle_hashes survives codegen and null input") {
    val df = Seq(Some("abcdef"), None).toDF("t")
      .select(ShingleHashes($"t", 3).as("h"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0).nonEmpty)
    assert(rows(1).isNullAt(0))
  }

  test("word_gram_hashes: window equality matches string windows exactly") {
    import graft.functions.WordGramHashes
    // parity cases: multi-space runs, tabs/newlines, leading/trailing
    // ws (incl. the \t\n edge where Spark's space-only trim leaves
    // EMPTY edge tokens), NUL bytes inside tokens, repeats (self-dup
    // windows), short docs, empty
    val texts = Seq(
      "alpha beta gamma delta beta gamma delta end",
      "  alpha\tbeta  gamma\ndelta ", // normalizes to the same tokens
      "\talpha beta gamma",           // leading tab -> leading "" token
      "alpha beta gamma\n",           // trailing newline -> trailing ""
      "p q r z p q r",
      "a b \u0000c", "a b c",         // NUL token must NOT alias "c"
      "one two", "one", "", "   ")
    val ordered = texts.toDF("t")
      .select(WordGramHashes($"t", 3, distinct = false).as("h"))
      .as[Seq[Long]].collect()
    // REFERENCE tokenization is Spark's own tokens() — the contract
    // the kernel must be byte-exact with (space-only trim, split
    // limit -1 keeping edge empties)
    val sparkToks = texts.toDF("t")
      .select(graft.ops.TextAnalysis.tokens($"t").as("tk"))
      .as[Seq[String]].collect()
    def windows(i: Int, n: Int): Seq[Seq[String]] = {
      val t = sparkToks(i)
      if (t.length < n) Nil
      else (0 to t.length - n).map(j => t.slice(j, j + n))
    }
    // build the global hash->window map; equal windows MUST share a
    // hash, distinct windows must not collide (2^-64; a hit here
    // would be a real bug at these sizes)
    val seen = scala.collection.mutable.Map[Long, Seq[String]]()
    texts.indices.foreach { ti =>
      val hs = ordered(ti)
      val ws = windows(ti, 3)
      assert(hs.length == ws.length, s"window count for '${texts(ti)}'")
      ws.zip(hs).foreach { case (w, h) =>
        seen.get(h) match {
          case Some(prev) => assert(prev == w, s"hash collision: $prev vs $w")
          case None => seen(h) = w
        }
      }
    }
    // the two whitespace variants of the same token stream hash equal
    assert(ordered(0).take(2) == ordered(1).take(2),
      "whitespace normalization broke window parity")
    // distinct variant == sorted distinct of the ordered one
    val dist = texts.toDF("t")
      .select(WordGramHashes($"t", 3, distinct = true).as("h"))
      .as[Seq[Long]].collect()
    texts.indices.foreach { i =>
      assert(dist(i) == ordered(i).distinct.sorted,
        s"distinct variant mismatch for '${texts(i)}'")
    }
  }

  test("word_gram_hashes survives codegen and null input") {
    import graft.functions.WordGramHashes
    val df = Seq(Some("a b c d"), None).toDF("t")
      .select(WordGramHashes($"t", 2, distinct = false).as("h"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0).length == 3)
    assert(rows(1).isNullAt(0))
  }

  test("minhash_sig: deterministic, monotone under set inclusion") {
    val a = Seq(1L, 2L, 3L, 4L, 5L)
    val b = a ++ Seq(6L, 7L)
    val df = Seq(a, b).toDF("h").select(MinHashSig($"h", 32).as("sig"))
    val Array(sa, sb) = df.as[Seq[Long]].collect()
    assert(sa.size == 32 && sb.size == 32)
    // adding elements can only lower each lane minimum
    sa.zip(sb).foreach { case (x, y) => assert(y <= x) }
    // identical input -> identical signature
    val again = Seq(a).toDF("h").select(MinHashSig($"h", 32).as("sig"))
      .as[Seq[Long]].collect()(0)
    assert(again == sa)
  }

  test("minhash similarity estimate tracks true jaccard") {
    val rng = new scala.util.Random(42)
    val base = Seq.fill(300)(rng.nextLong())
    val overlap80 = base.take(240) ++ Seq.fill(60)(rng.nextLong())
    val df = Seq(base, overlap80).toDF("h").select(MinHashSig($"h", 256).as("sig"))
    val Array(sa, sb) = df.as[Seq[Long]].collect()
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
    val trueJ = base.toSet.intersect(overlap80.toSet).size.toDouble /
      base.toSet.union(overlap80.toSet).size
    assert(math.abs(est - trueJ) < 0.12, s"est $est vs true $trueJ")
  }
}
