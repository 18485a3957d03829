package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines. Everything is
  * built from `org.apache.spark.sql.functions` (whole-stage codegen'd,
  * no UDFs) so it survives a 100 TB corpus: per-row narrow transforms,
  * no shuffles.
  */
object TextAnalysis {

  /** Whitespace for the tokenization contract, spelled as an EXPLICIT
    * character class: Java regex `\s` includes vertical tab (\x0B),
    * DuckDB/RE2 `\s` does not, so a doc containing \x0B would tokenize
    * (and hence count/entropy/ngram) differently in the two engines.
    * Pinning the five RE2 characters keeps Spark and any RE2-based
    * replaying engine byte-for-byte in agreement. Oracle SQL may keep
    * writing `\s` — in RE2 that IS this class. */
  private[graft] val WsClass = "[ \\t\\n\\f\\r]"

  /** whitespace tokens; empty/blank text -> 0 tokens */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), WsClass + "+")).cast("long"))

  /** BPE-ish subword-ish count: word pieces + punctuation as separate
    * tokens, via one regex pass. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n\\f\\r]"), lit(0))).cast("long")

  def tokens(text: Column): Column = split(trim(text), WsClass + "+")

  /** Bind `c` to a lambda variable so downstream references evaluate it
    * ONCE per row. Without this, an expression referenced inside a
    * `transform` lambda is re-evaluated per array element (a regex
    * normalization inside a 200-shingle transform runs 200x). */
  def once(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), x => f(x)), 1)

  /** k-char shingle array (distinct) — the unit for MinHash / Jaccard. */
  def charShingles(text: Column, k: Int = 5): Column =
    once(lower(regexp_replace(trim(text), WsClass + "+", " "))) { norm =>
      when(length(norm) < k, array(norm)).otherwise(
        array_distinct(transform(
          sequence(lit(1), length(norm) - (k - 1)),
          i => norm.substr(i, lit(k)))))
    }

  /** word n-gram array (distinct). Texts shorter than `n` tokens fall
    * back to one whole-text gram (useful for similarity, where a short
    * doc should still be comparable to itself). */
  def wordNgrams(text: Column, n: Int = 3): Column =
    once(tokens(text)) { toks =>
      when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(
        array_distinct(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
    }

  /** word n-gram array (distinct), STRICT: a text with fewer than `n`
    * tokens yields NO grams. This is the membership-test semantic (a
    * 5-token doc does not contain any 8-gram) — the whole-text fallback
    * of [[wordNgrams]] would let two unrelated short texts "share" a
    * gram, which turns contamination checks into false positives. */
  def wordNgramsStrict(text: Column, n: Int): Column =
    once(tokens(text)) { toks =>
      when(size(toks) < n, array().cast("array<string>")).otherwise(
        array_distinct(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
    }

  /** Heuristic language ID, two stages, no model:
    *
    *  1. Unicode-SCRIPT ratio for languages whose script is (near-)
    *     unique to them — if >30% of non-whitespace chars are in the
    *     script, the language is decided (kana before Han: Japanese
    *     text mixes kanji with kana, pure Han is Chinese);
    *  2. otherwise a STOPWORD table over Latin- and Cyrillic-script
    *     languages — the language whose stopwords hit the most tokens
    *     wins (ties break to the lexicographically largest code,
    *     deterministically); `und` when nothing hits.
    *
    * ~28 languages total. Both stages are narrow codegen'd expressions
    * (regexp counts + one array scan), zero shuffles. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "es" -> Seq("el", "la", "de", "que", "los", "en", "un", "por", "con", "una"),
    "fr" -> Seq("le", "la", "les", "des", "est", "dans", "que", "une", "pour", "qui"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"),
    "it" -> Seq("il", "di", "che", "la", "per", "con", "del", "una", "sono", "non"),
    // pt/da/no lists revised round 12 against the labeled confusable
    // fixture (LangIdConfusablesSpec): pt gained its true
    // highest-frequency function words (de/em/na/o/um — the old list
    // missed them, so natural pt sentences scored 0 and fell to
    // tr/ro/pl on shared clitics); da/no dropped the words BOTH
    // languages share unequally (han/ikke sat only in no's list and
    // pulled Danish sentences to no) and gained their true
    // discriminators (da "af"/"at", no "av"/"å")
    "pt" -> Seq("não", "que", "uma", "para", "com", "de", "em", "na", "o", "um"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "niet", "met", "voor", "zijn"),
    "sv" -> Seq("och", "att", "det", "som", "på", "är", "av", "för", "med", "den"),
    "da" -> Seq("og", "det", "at", "en", "den", "til", "er", "på", "med", "af"),
    "no" -> Seq("og", "det", "som", "er", "til", "på", "med", "av", "en", "å"),
    "fi" -> Seq("ja", "on", "ei", "että", "hän", "oli", "se", "mutta", "kun", "niin"),
    "pl" -> Seq("nie", "się", "jest", "na", "do", "że", "z", "po", "jak", "ale"),
    "cs" -> Seq("je", "se", "na", "že", "to", "v", "s", "ale", "jako", "už"),
    "ro" -> Seq("și", "de", "la", "cu", "un", "o", "este", "pentru", "care", "nu"),
    "hu" -> Seq("és", "a", "az", "hogy", "nem", "is", "egy", "van", "de", "meg"),
    "tr" -> Seq("bir", "ve", "bu", "için", "de", "da", "ne", "gibi", "çok", "daha"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "akan"),
    "vi" -> Seq("và", "của", "là", "có", "không", "được", "trong", "một", "người", "những"),
    "ru" -> Seq("и", "в", "не", "на", "что", "с", "он", "как", "это", "по"),
    "uk" -> Seq("і", "в", "не", "на", "що", "з", "він", "як", "це", "за"),
  )

  /** Distinctive character n-grams for the Latin-script languages
    * whose 10-word stopword lists can tie — da/no share most function
    * words, es/pt share "que" — plus sv (da/no/sv overlap). Occurrence
    * counts are capped at 9 and weighted BELOW one stopword hit
    * (combined score = stopwords*16 + min(gram hits, 9)), so n-gram
    * evidence breaks stopword ties and near-ties but never overrides a
    * clear stopword verdict. Grams are orthography, not vocabulary:
    * da "af"/"hvad"/"hedder" vs no "av"/"hva"/"heter"; es "ción"/"ñ"
    * vs pt "ção"/"ã". All public-knowledge contrasts. */
  val charNgrams: Map[String, Seq[String]] = Map(
    // da/no widened round 12 with the soft-vs-hard consonant contrast
    // (da løbe/købe/smager/kage vs no løpe/kjøpe/smaker/kake), the
    // gade/gate uge/uke mad/mat word pairs, -igt adverbs, and the
    // language's own name — measured on LangIdConfusablesSpec
    "da" -> Seq(" af ", " hvad ", "hedder", "undskyld", "øb", " mad ",
      " uge", " gade", "ager", "igt", "dansk"),
    "no" -> Seq(" av ", " hva ", "heter", "unnskyld", "øpe", " mat ",
      " uke", " gate", "aker", " blir ", "norsk"),
    "sv" -> Seq(" och ", " är ", " vad ", " jag "),
    // es/pt widened with más/ón (es-only accents) and lh/nh/há (pt-only
    // digraphs)
    "es" -> Seq("ción", "ñ", " y ", " es ", " más ", "ón"),
    "pt" -> Seq("ção", "ã", " é ", " e ", "lh", "nh", " há "))

  /** Script-decided languages in CHECK ORDER: (code, Java regex char
    * class, RE2 char class for the DuckDB oracle). Kana must precede
    * Han (see [[langId]]). */
  val scriptLangs: Seq[(String, String, String)] = Seq(
    ("ja", "\\p{IsHiragana}\\p{IsKatakana}", "\\p{Hiragana}\\p{Katakana}"),
    ("zh", "\\p{IsHan}", "\\p{Han}"),
    ("ko", "\\p{IsHangul}", "\\p{Hangul}"),
    ("ar", "\\p{IsArabic}", "\\p{Arabic}"),
    ("he", "\\p{IsHebrew}", "\\p{Hebrew}"),
    ("hi", "\\p{IsDevanagari}", "\\p{Devanagari}"),
    ("th", "\\p{IsThai}", "\\p{Thai}"),
    ("el", "\\p{IsGreek}", "\\p{Greek}"))

  /** best-scoring language code or 'und' — the native one-pass kernel
    * ([[graft.functions.LangIdK]]). The declarative tree it replaced
    * evaluated its 21 per-language HOF structs interpreted with no
    * subexpression reuse: 94 s over 500k rehearsal docs for pieces
    * that sum to ~7 s; the kernel runs the identical decision from the
    * identical tables in ~2 s. [[langIdDeclarative]] stays as the
    * differential-spec reference.
    *
    * NULL CONTRACT (deliberate change vs the declarative tree, r15):
    * null text → null, where the old tree returned an arbitrary
    * max-over-null-structs language code. Callers that aggregate,
    * write, or PARTITION by the lang column must handle the null
    * bucket (filter nulls first, or coalesce to 'und' explicitly if
    * the old behavior's total bucketing is wanted). */
  def langId(text: Column): Column = graft.functions.LangIdK(text)

  /** The original composed-expression langId — semantics reference for
    * the kernel's differential spec ONLY (quadratic-ish interpreted
    * eval; never call it on corpus-scale data). */
  private[graft] def langIdDeclarative(text: Column): Column = {
    val nonspace = length(regexp_replace(text, WsClass, "")).cast("double")
    scriptLangs.foldRight(stopwordLangId(text)) { case ((lang, jcls, _), rest) =>
      when(length(regexp_replace(text, s"[^$jcls]", "")).cast("double")
        > nonspace * 0.3, lit(lang)).otherwise(rest)
    }
  }

  private def stopwordLangId(text: Column): Column = {
    val toks = tokens(lower(text))
    // padded so word-boundary grams (" af ") match at string edges too
    val padded = concat(lit(" "), lower(text), lit(" "))
    def ngramScore(lang: String): Column = charNgrams.get(lang) match {
      case None => lit(0)
      case Some(grams) => least(grams.map(g =>
          ((length(padded) - length(replace(padded, lit(g), lit(""))))
            / lit(g.length)).cast("int")).reduce(_ + _), lit(9))
    }
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct((size(filter(toks, t => t.isin(words: _*))) * 16
          + ngramScore(lang)).as("score"),
        lit(lang).as("lang"))
    }
    // struct max = (stopwords*16 + grams, then lang) — stopword count
    // decides first (grams capped at 9 < 16), grams break its ties,
    // remaining ties pick the lex-largest code
    val best = array_max(array(scored: _*))
    when(best.getField("score") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Count of `text` chars belonging to the literal set `chars` — one
    * codegen'd char-map pass (`translate`), value-identical to (and
    * ~18x faster than) the negated-class `regexp_replace` length diff
    * it replaced: 31.3 s -> 1.75 s over 500k rehearsal docs, where the
    * regex NFA + rebuilt result string dominated the whole composed
    * pipeline's quality stage. */
  private def countChars(text: Column, chars: String): Column =
    (length(text) - length(translate(text, chars, ""))).cast("double")

  /** Quality heuristics: length, alpha ratio, punctuation ratio,
    * stopword ratio, mean token length — combined into [0,1]. */
  def qualityFeatures(text: Column): Column = {
    val len = length(text).cast("double")
    val alpha = countChars(text,
      ('A' to 'Z').mkString + ('a' to 'z').mkString + " ")
    val punct = countChars(text, ".,;:!?'\"")
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val sw = size(filter(tokens(lower(text)),
      t => stopwords("en").map(w => t === lit(w)).reduceLeft(_ || _))).cast("double")
    struct(
      len.as("n_chars"),
      nTok.as("n_tokens"),
      (alpha / greatest(len, lit(1.0))).as("alpha_ratio"),
      (punct / greatest(len, lit(1.0))).as("punct_ratio"),
      (sw / greatest(nTok, lit(1.0))).as("stopword_ratio"),
      (len / greatest(nTok, lit(1.0))).as("mean_token_len"))
  }

  /** Gopher-style quality RULES (Rae et al. 2021, the published
    * crawl-filter rule set) as explicit per-document booleans — the
    * auditable complement to [[qualityScore]]'s scalar: a pipeline
    * can report WHICH rule dropped a document, not just that one did.
    * Every term is an exact integer/ratio computation over the shared
    * tokenizer, so the DuckDB oracle replays each boolean:
    *  - ok_word_count: 50 <= tokens <= 100000
    *  - ok_mean_word_len: mean token length in [3, 10]
    *  - ok_symbol_ratio: (# + ellipsis occurrences) / tokens < 0.1
    *  - ok_bullet_lines: < 90% of lines start with a bullet
    *  - ok_ellipsis_lines: < 30% of lines end with "..."
    *  - ok_alpha_words: > 80% of tokens contain a letter
    *  - ok_stopwords: >= 2 distinct common-English stopwords present
    * `keep` is their conjunction. Narrow per-row expressions, zero
    * shuffle, fully pushdown-friendly. */
  def gopherRules(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val meanLen = length(array_join(toks, "")).cast("double") / greatest(nTok, lit(1.0))
    val hashes = countChars(text, "#")
    val ellipses =
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("double")
    val symbolRatio = (hashes + ellipses) / greatest(nTok, lit(1.0))
    val lines = split(text, "\n")
    val nLines = size(lines).cast("double")
    val bulletFrac = size(filter(lines, l =>
      trim(l).startsWith("- ") || trim(l).startsWith("* ") ||
        trim(l).startsWith("•"))).cast("double") / greatest(nLines, lit(1.0))
    val ellipsisFrac = size(filter(lines, l =>
      trim(l).endsWith("..."))).cast("double") / greatest(nLines, lit(1.0))
    val alphaFrac = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") /
      greatest(nTok, lit(1.0))
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val nStops = size(array_intersect(
      array_distinct(tokens(lower(text))),
      array(gopherStops.map(lit): _*)))
    struct(
      (size(toks) >= 50 && size(toks) <= 100000).as("ok_word_count"),
      (meanLen >= 3.0 && meanLen <= 10.0).as("ok_mean_word_len"),
      (symbolRatio < 0.1).as("ok_symbol_ratio"),
      (bulletFrac < 0.9).as("ok_bullet_lines"),
      (ellipsisFrac < 0.3).as("ok_ellipsis_lines"),
      (alphaFrac > 0.8).as("ok_alpha_words"),
      (nStops >= 2).as("ok_stopwords")
    ) match { case s =>
      struct((s.getField("ok_word_count") && s.getField("ok_mean_word_len") &&
        s.getField("ok_symbol_ratio") && s.getField("ok_bullet_lines") &&
        s.getField("ok_ellipsis_lines") && s.getField("ok_alpha_words") &&
        s.getField("ok_stopwords")).as("keep"),
        s.getField("ok_word_count").as("ok_word_count"),
        s.getField("ok_mean_word_len").as("ok_mean_word_len"),
        s.getField("ok_symbol_ratio").as("ok_symbol_ratio"),
        s.getField("ok_bullet_lines").as("ok_bullet_lines"),
        s.getField("ok_ellipsis_lines").as("ok_ellipsis_lines"),
        s.getField("ok_alpha_words").as("ok_alpha_words"),
        s.getField("ok_stopwords").as("ok_stopwords"))
    }
  }

  /** scalar quality score in [0,1]: high alpha, some stopwords, sane
    * token length, low punctuation. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenScore = least(f.getField("n_tokens") / lit(20.0), lit(1.0))
    val alphaScore = f.getField("alpha_ratio")
    val punctScore = greatest(lit(1.0) - f.getField("punct_ratio") * 5.0, lit(0.0))
    val swScore = least(f.getField("stopword_ratio") * 4.0, lit(1.0))
    round((lenScore * 0.25 + alphaScore * 0.35 + punctScore * 0.2 + swScore * 0.2), 6)
  }

  /** Shannon entropy (bits) of the within-doc word distribution — the
    * Gopher-class diversity signal: templated/repetitive text scores
    * low even when [[graft.ops.Curation.repetitionFeatures]]' dup_ratio
    * (which only sees the distinct fraction) looks fine. Computed
    * NARROWLY by the native [[graft.functions.WordEntropyK]] kernel
    * (sort + one run-length pass per row — the declarative
    * sort_array + aggregate fold it replaces allocated an interpreted
    * struct per element, 1.3 ms/doc at the 10x rehearsal) — no
    * explode, no per-word shuffle; the DuckDB oracle recomputes via
    * unnest + group-by. Docs with < 2 tokens score 0 (a one-point
    * distribution has no uncertainty). */
  def wordEntropy(text: Column): Column =
    round(graft.functions.WordEntropyK(tokens(text)), 6)

  /** Content-defined document fingerprint: min over the one-pass
    * rolling k-gram hashes (winnowing-style); stable under whitespace
    * normalization. Uses the native ShingleHashes expression. */
  def fingerprint(text: Column, k: Int = 8): Column =
    array_min(graft.functions.ShingleHashes(
      lower(regexp_replace(trim(text), WsClass + "+", " ")), k))

  /** The same winnowing-style min-gram signature with a SQL-portable
    * hash: min over every k-gram's md5-prefix (60-bit, always
    * positive), on whitespace-normalized lowercase text. External
    * engines can recompute it bit-exactly (DuckDB:
    * `('0x' || substring(md5(g),1,15))::BIGINT`), so it runs under the
    * value oracle where [[fingerprint]]'s native 64-bit rolling
    * arithmetic cannot. Texts shorter than k hash as one whole-text
    * gram. The per-gram md5 costs more than the one-pass rolling hash
    * — prefer [[fingerprint]] in-engine; this is the interchange form. */
  def minGramSig(text: Column, k: Int = 8): Column = {
    val t = lower(regexp_replace(trim(text), WsClass + "+", " "))
    val n = greatest(length(t) - (k - 1), lit(1))
    array_min(transform(sequence(lit(1), n),
      p => conv(substring(md5(t.substr(p, lit(k)).cast("binary")), 1, 15), 16, 10)
        .cast("long")))
  }

  /** md5 exact-content fingerprint (SQL-portable). */
  def md5Fingerprint(text: Column): Column = md5(text.cast("binary"))

  // ------------------------------------------------------------- real BPE

  /** Embedded byte-pair-encoding merge table (GPT-2-style algorithm,
    * compact public-knowledge table): rank order IS the merge priority.
    * The table is WELL-FORMED — each operand is a single character or
    * the output of a strictly earlier merge (pinned by `TokenSpec`) —
    * which guarantees greedy rank-ordered merging is confluent: new
    * pairs created by a merge always rank later than the merge that
    * created them, so applying occurrences in any order converges to
    * the same segmentation. In production this table is swapped for a
    * learned vocabulary (e.g. the 50k GPT-2 merges); the ALGORITHM —
    * lowest-rank adjacent pair merges first, all occurrences, repeat —
    * is the real thing, not a regex approximation. */
  /** The LEARNED BPE merge table: trained by [[graft.tools.TrainBpe]]
    * (the real greedy highest-pair-count algorithm, see [[trainBpe]])
    * over the documents corpus and embedded as a resource, the same
    * way production tokenizers ship a merges.txt trained offline.
    * Deterministic load order = learned rank order. (lazy: the trainer
    * tool itself must run before the resource exists) */
  lazy val bpeMerges: Vector[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "missing embedded BPE merge table graft/bpe_merges.txt " +
      "(regenerate with: runMain graft.tools.TrainBpe <docs.parquet> " +
      "src/main/resources/graft/bpe_merges.txt <numMerges>)")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty)
      .map { l => val i = l.indexOf(' '); (l.substring(0, i), l.substring(i + 1)) }
      .toVector
    finally in.close()
  }

  /** Train a BPE merge table on a corpus — the REAL algorithm, shaped
    * for scale the way production trainers (GPT-2's, SentencePiece,
    * HF tokenizers) are:
    *
    *  1. ONE distributed pass collects the pre-tokenized word
    *     frequency table, cut to the top `maxWords` by (count, word) —
    *     vocabulary-bounded, not corpus-bounded, so this is the only
    *     step that touches data scale;
    *  2. the classic greedy loop runs driver-side over (word, count):
    *     merge the adjacent symbol pair with the highest total count,
    *     update pair counts incrementally (only words containing the
    *     merged pair are touched), repeat `numMerges` times or until
    *     the best pair's count drops below `minFrequency`.
    *
    * Fully deterministic: pair-count ties break to the
    * lexicographically largest pair, and the top-N word cut breaks
    * count ties by word.
    *
    * The `maxWords` cut is NOT silent: when the corpus vocabulary
    * exceeds it, the dropped word count and dropped token-mass
    * fraction are logged (tail words change pair counts; at real
    * corpus scale you want to know how much mass the cut removed). */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int = 2000,
      maxWords: Int = 100000, minFrequency: Long = 2L): Vector[(String, String)] = {
    val wordCounts = df
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit(bpePretokenPattern), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val words = wordCounts
        .orderBy(col("n").desc, col("w"))
        .limit(maxWords)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      if (words.length == maxWords) {
        // vocabulary may exceed the cut — measure what it dropped
        val tot = wordCounts.agg(count(lit(1)).as("dw"), sum(col("n")).as("mass")).head()
        val (distinct, mass) = (tot.getLong(0), tot.getLong(1))
        if (distinct > maxWords) {
          val keptMass = words.map(_._2).sum
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            f"trainBpe: maxWords=$maxWords cut dropped ${distinct - maxWords} of $distinct " +
              f"distinct words (${(mass - keptMass).toDouble / mass * 100}%.2f%% of token mass)")
          // same facts on the unified counter surface (Stats.dump)
          graft.core.Stats.counter(df.sparkSession, "bpe.words_cut")
            .add(distinct - maxWords)
          graft.core.Stats.counter(df.sparkSession, "bpe.mass_cut_ppm")
            .add((mass - keptMass) * 1000000L / math.max(mass, 1L))
        }
      }
      trainBpeOnCounts(words, numMerges, minFrequency)
    } finally { wordCounts.unpersist() }
  }

  /** Driver-side greedy merge loop. Two structures keep a 16-32k-merge
    * run over a 100k-word vocabulary at interactive speed (the naive
    * loop re-scans every word per merge — quadratic and ~hours at that
    * size):
    *   - `occurs`: pair -> word indices that contained the pair when it
    *     was counted (a SUPERSET — entries go stale when another merge
    *     rewrites the word; re-checked cheaply at merge time), so each
    *     merge touches only candidate words, not the whole vocabulary;
    *   - a lazy-deletion max-heap over (count, a, b): every count
    *     change pushes a fresh entry; pops discard entries whose stored
    *     count no longer matches the live count. The surviving top is
    *     exactly `maxBy (count, a, b)` of the live table, so results
    *     are bit-identical to the reference loop. */
  private[graft] def trainBpeOnCounts(words: Array[(String, Long)],
      numMerges: Int, minFrequency: Long = 2L): Vector[(String, String)] = {
    val syms = words.map { case (w, _) => w.map(_.toString).toArray }
    val wcount = words.map(_._2)
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occurs = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.ArrayBuffer[Int]]
    implicit val heapOrd: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long, Ordering.String, Ordering.String)
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)]
    def bump(s: Array[String], n: Long, w: Int): Unit = {
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = counts.getOrElse(p, 0L) + n
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (c > 0L) heap.enqueue((c, p._1, p._2))
        if (n > 0L)
          occurs.getOrElseUpdate(p, new scala.collection.mutable.ArrayBuffer[Int]) += w
        i += 1
      }
    }
    var w = 0
    while (w < syms.length) { bump(syms(w), wcount(w), w); w += 1 }
    val out = Vector.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      // discard stale heap entries; the surviving top is the live max
      var best: ((String, String), Long) = null
      while (best == null && heap.nonEmpty) {
        val (c, a, b) = heap.head
        if (counts.getOrElse((a, b), 0L) == c) best = ((a, b), c)
        else heap.dequeue()
      }
      if (best == null || best._2 < minFrequency) exhausted = true
      else {
        val (a, b) = best._1
        out += ((a, b))
        val cand = occurs.remove((a, b))
          .getOrElse(scala.collection.mutable.ArrayBuffer.empty[Int])
        val seen = new scala.collection.mutable.BitSet(syms.length)
        var ci = 0
        while (ci < cand.length) {
          val i = cand(ci)
          if (!seen(i)) {
            seen += i
            val s = syms(i)
            var has = false
            var j = 0
            while (!has && j < s.length - 1) { has = s(j) == a && s(j + 1) == b; j += 1 }
            if (has) {
              bump(s, -wcount(i), i)
              val m = new scala.collection.mutable.ArrayBuffer[String](s.length)
              var t = 0
              while (t < s.length) {
                if (t < s.length - 1 && s(t) == a && s(t + 1) == b) { m += a + b; t += 2 }
                else { m += s(t); t += 1 }
              }
              syms(i) = m.toArray
              bump(syms(i), wcount(i), i)
            }
          }
          ci += 1
        }
        k += 1
      }
    }
    out.result()
  }

  /** pre-tokenizer: letter runs, digit runs, symbol runs; whitespace
    * separates (same RE2/Java-compatible class on both engines) */
  private[graft] val bpePretokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"

  private lazy val bpeRanks: Map[(String, String), Int] =
    bpeMerges.zipWithIndex.map { case (p, i) => p -> i }.toMap

  /** Greedy BPE segment count of one pre-token: repeatedly merge ALL
    * occurrences (left-to-right, non-overlapping) of the lowest-rank
    * adjacent pair until none matches the table. */
  private[graft] def bpeSegmentCount(word: String): Int =
    bpeSegmentCount(word, bpeMerges, bpeRanks)

  /** table-explicit variant (tests pass algorithm fixtures; production
    * uses the learned table above) */
  private[graft] def bpeSegmentCount(word: String,
      merges: Vector[(String, String)], ranks: Map[(String, String), Int]): Int =
    bpeSegment(word, merges, ranks).length

  /** Greedy lowest-rank segmentation, returning the final SYMBOLS
    * (each a single char or a merge output). [[bpeSegmentCount]] is
    * its length — one loop, two views. */
  private[graft] def bpeSegment(word: String,
      merges: Vector[(String, String)],
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) { out += a + b; j += 2 }
          else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Stable token-id scheme over the learned vocabulary, replayable by
    * the DuckDB oracle with zero drift:
    *  - a single-char symbol's id is its Unicode code point (BMP —
    *    the pre-tokenizer and the merge loop both operate on UTF-16
    *    units, matching the oracle's per-codepoint split for BMP text);
    *  - a merge-output symbol's id is 0x110000 (one past the Unicode
    *    range, so the spaces can never collide) + its index in the
    *    DISTINCT merge-output list in rank order (two merges can
    *    produce the same string — ("a","bc") and ("ab","c") — so ids
    *    key on the string, first rank wins). */
  private[graft] lazy val bpeVocabIds: Map[String, Int] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    bpeMerges.foreach { case (a, b) =>
      val w = a + b
      if (!seen.contains(w)) seen(w) = 0x110000 + seen.size
    }
    seen.toMap
  }

  private[graft] def bpeTokenIdsOf(word: String): Array[Int] =
    bpeSegment(word, bpeMerges, bpeRanks).map { s =>
      if (s.length == 1) s.charAt(0).toInt
      else bpeVocabIds.getOrElse(s, -1) // -1 unreachable: multi-char symbols ARE merge outputs
    }

  /** Training-ready token ids per doc: pre-tokenize, segment each word
    * under the learned table, map symbols to stable ids
    * ([[bpeVocabIds]]), concatenate in document order. Same
    * per-partition word memo as [[bpeTokenCounts]] — the merge loop
    * runs once per distinct word per partition; each row stays a
    * narrow independent transform. */
  def bpeTokenIds(ds: Dataset[(Long, String)]): Dataset[(Long, Array[Int])] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val re = java.util.regex.Pattern.compile(bpePretokenPattern)
      val memo = new java.util.HashMap[String, Array[Int]]()
      rows.map { case (id, text) =>
        val m = re.matcher(if (text == null) "" else text.toLowerCase)
        val out = new scala.collection.mutable.ArrayBuffer[Int]()
        while (m.find()) {
          val w = m.group()
          var ids = memo.get(w)
          if (ids == null) { ids = bpeTokenIdsOf(w); memo.put(w, ids) }
          out ++= ids
        }
        (id, out.toArray)
      }
    }
  }

  /** Per-doc BPE token counts over (id, text) rows: mapPartitions with
    * a per-partition word->count memo — corpus vocabulary is Zipfian,
    * so the merge loop runs once per DISTINCT word per partition, and
    * each row is a narrow independent transform (no shuffle, scales
    * linearly with executors). */
  def bpeTokenCounts(ds: Dataset[(Long, String)]): Dataset[(Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val re = java.util.regex.Pattern.compile(bpePretokenPattern)
      val memo = new java.util.HashMap[String, Integer]()
      rows.map { case (id, text) =>
        val m = re.matcher(if (text == null) "" else text.toLowerCase)
        var total = 0L
        while (m.find()) {
          val w = m.group
          var n = memo.get(w)
          if (n == null) { n = bpeSegmentCount(w); memo.put(w, n) }
          total += n.toLong
        }
        (id, total)
      }
    }
  }

  /** Split long documents into fixed-token-window chunks with overlap
    * (the context-window prep step for training and retrieval). Chunk
    * `i` covers whitespace tokens `[i*stride, i*stride + maxTokens)`
    * with `stride = maxTokens - overlap`; the final chunk always
    * reaches the document's end; docs at or under `maxTokens` yield
    * one chunk; empty docs none. One narrow explode per row — no
    * shuffle, no state; deterministic, so DuckDB replays it
    * value-exactly. Returns (idCol, chunk_id, n_tokens, chunk). */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    val stride = maxTokens - overlap
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L),
        when(col("__n") <= maxTokens, lit(0L)).otherwise(
          ceil((col("__n") - lit(overlap)).cast("double") / stride).cast("long") - 1))))
      .select(col(idCol), col("chunk_id"),
        least(lit(maxTokens.toLong), col("__n") - col("chunk_id") * stride)
          .as("n_tokens"),
        concat_ws(" ", slice(col("__t"),
          (col("chunk_id") * stride + 1).cast("int"), lit(maxTokens))).as("chunk"))
  }

  // --------------------------------------------------------------------
  // Multi-phrase exact scan (Aho-Corasick, 1975 — public algorithm).
  //
  // "Which documents contain which of these phrases?" is the eval-canary
  // / blocklist / decontamination primitive: the phrase list is fixed
  // and rescanned against every new batch. The naive shape — one
  // `contains` per phrase — reads every document |phrases| times; the
  // automaton reads each document ONCE regardless of list size (per-char
  // work is a goto-transition plus already-matched output emission), so
  // scan cost is corpus-bound, not corpus x phrases. Built per
  // partition from a broadcast phrase array: no shuffle, no driver
  // round-trips, embarrassingly parallel.

  /** Per-JVM (= per-executor) automaton cache. At blocklist scale
    * (P=100k is ~1.5M trie nodes, hundreds of MB) a per-PARTITION
    * build is both a heap bomb (32 concurrent copies on one executor)
    * and repeated work; one copy per executor, built once under
    * computeIfAbsent, serves every task. Keyed by a CONTENT hash of
    * the phrase set (not the broadcast id): repeated scans with the
    * same blocklist re-broadcast but must still hit. Bounded: keeping
    * at most 4 automatons absorbs interleaved blocklists without ever
    * growing into a leak. */
  private final class AcEntry(val ref: java.lang.ref.SoftReference[AhoCorasick]) {
    /** monotonic last-use tick — the LRU eviction basis (wall time
      * would work too, but a counter is immune to clock steps). */
    @volatile var lastUse: Long = acTick.incrementAndGet()
  }
  private val acTick = new java.util.concurrent.atomic.AtomicLong()
  private val acCache =
    new java.util.concurrent.ConcurrentHashMap[String, AcEntry]()
  /** spec seam: deterministic eviction tests need a known-empty cache
    * (suites share one JVM). */
  private[graft] def clearAutomatonCache(): Unit = acCache.clear()

  /** Driver-side content key for [[acCache]]: md5 over length-framed
    * phrases (framing, not a separator — no phrase list may collide
    * with another's concatenation). */
  private[graft] def phraseSetKey(phrases: Array[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val lenBuf = java.nio.ByteBuffer.allocate(4)
    phrases.foreach { p =>
      val b = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      lenBuf.clear(); lenBuf.putInt(b.length)
      md.update(lenBuf.array()); md.update(b)
    }
    java.util.Base64.getEncoder.encodeToString(md.digest())
  }

  /** One automaton per executor for this phrase set; the builder runs
    * once under `compute`'s bin lock (other tasks block on it briefly —
    * that IS the win vs 32 concurrent quarter-GB builds). Entries hold
    * SoftReferences, so a big automaton the JVM needs back is GC-
    * reclaimed rather than pinned (and rebuilt on next use); the bound
    * sweep runs OUTSIDE the compute lambda (a recursive map update
    * would throw). */
  private[graft] def cachedAutomaton(key: String,
      phrases: => Array[String]): AhoCorasick = {
    var ac: AhoCorasick = null
    while (ac == null) {
      // a freshly BUILT automaton must leave compute() via a strong
      // reference: soft refs are exactly what GC clears first under
      // pressure, and losing the only reference between compute() and
      // get() would rebuild the multi-second automaton in a loop
      var built: AhoCorasick = null
      val entry = acCache.compute(key, (_, old) =>
        if (old != null && old.ref.get() != null) old
        else {
          built = new AhoCorasick(phrases)
          new AcEntry(new java.lang.ref.SoftReference(built))
        })
      // cache-hit path: get() can only be null if GC cleared the entry
      // in this instant — the next iteration then takes the build path
      ac = if (built != null) built else entry.ref.get()
      if (ac != null) entry.lastUse = acTick.incrementAndGet()
    }
    // bound sweep: drop GC-cleared entries first, then LEAST-RECENTLY-
    // USED — arbitrary hash-iteration eviction could repeatedly evict
    // an automaton a concurrent scan is actively reusing (>4
    // interleaved phrase sets = rebuild churn, multi-second per rebuild
    // at P=100k). Runs OUTSIDE compute() (recursive map update
    // throws); racing sweeps are harmless — worst case both evict and
    // the next use rebuilds once.
    if (acCache.size > 4) {
      val it = acCache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey != key && e.getValue.ref.get() == null) it.remove()
      }
      var done = false
      while (!done && acCache.size > 4) {
        var lruKey: String = null
        var lruUse = Long.MaxValue
        val it2 = acCache.entrySet().iterator()
        while (it2.hasNext) {
          val e = it2.next()
          if (e.getKey != key && e.getValue.lastUse < lruUse) {
            lruUse = e.getValue.lastUse; lruKey = e.getKey
          }
        }
        if (lruKey == null) done = true // only the current key remains
        else acCache.remove(lruKey)
      }
    }
    ac
  }

  /** Aho-Corasick automaton over exact char sequences. `containedIn`
    * returns the distinct indices of phrases occurring in the text. */
  private[graft] final class AhoCorasick(phrases: Array[String]) {
    /** trie node count — the memory-footprint driver (rehearsal row). */
    def nodes: Int = n
    private val size0 = phrases.map(_.length).sum + 1
    private val next = new Array[java.util.HashMap[Char, Integer]](size0)
    private val fail = new Array[Int](size0)
    // per-node output list, merged with the fail chain's at build time
    private val out = new Array[List[Int]](size0)
    private var n = 1
    next(0) = new java.util.HashMap[Char, Integer](); out(0) = Nil
    // trie
    phrases.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val t = next(s).get(c)
        if (t == null) {
          next(n) = new java.util.HashMap[Char, Integer](); out(n) = Nil
          next(s).put(c, n); s = n; n += 1
        } else s = t
        i += 1
      }
      out(s) ::= pi
    }
    // fail links by BFS; merge fail target's outputs so matching never
    // walks the fail chain per character
    locally {
      val q = new java.util.ArrayDeque[Integer]()
      val rootIt = next(0).entrySet().iterator()
      while (rootIt.hasNext) {
        val s = rootIt.next().getValue.intValue()
        fail(s) = 0; q.add(s)
      }
      while (!q.isEmpty) {
        val s = q.poll().intValue()
        out(s) = out(s) ::: out(fail(s))
        val it = next(s).entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getKey
          val t = e.getValue.intValue()
          var f = fail(s)
          while (f != 0 && !next(f).containsKey(c)) f = fail(f)
          val fc = next(f).get(c)
          fail(t) = if (fc != null) fc.intValue() else 0
          q.add(t)
        }
      }
    }

    /** Distinct phrase indices contained in `text`, ascending. */
    def containedIn(text: String): Array[Int] = {
      val seen = new java.util.BitSet(phrases.length)
      var found = 0
      var s = 0
      var i = 0
      while (i < text.length && found < phrases.length) {
        val c = text.charAt(i)
        var t = next(s).get(c)
        while (t == null && s != 0) { s = fail(s); t = next(s).get(c) }
        s = if (t == null) 0 else t.intValue()
        var os = out(s)
        while (os.nonEmpty) {
          if (!seen.get(os.head)) { seen.set(os.head); found += 1 }
          os = os.tail
        }
        i += 1
      }
      val res = new Array[Int](found)
      var b = seen.nextSetBit(0); var j = 0
      while (b >= 0) { res(j) = b; j += 1; b = seen.nextSetBit(b + 1) }
      res
    }
  }

  /** All (id, phrase) pairs where the document's `textCol` contains the
    * phrase as an exact char-level substring. One automaton scan per
    * document regardless of phrase count; output is match-bound. The id
    * column must be castable to long (the repo's doc_id convention).
    * Null texts — and rows whose id is null or does not cast to long —
    * are skipped consistently; each contained phrase reports once. */
  def phraseMatches(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(p => p != null && p.nonEmpty),
      "phrases must be a non-empty list of non-empty strings")
    val uniq = phrases.distinct.toArray
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(uniq)
    val acKey = phraseSetKey(uniq)
    // drop null / non-castable ids BEFORE the non-nullable tuple
    // encoder: uncaught, they fail mid-job (ANSI cast error or an
    // obscure encoder NPE) while null texts are skipped — try_cast +
    // filter gives one consistent skip rule for both
    val hits = df.select(col(idCol).try_cast("long").as("__id"), col(textCol))
      .filter(col("__id").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        // one automaton per EXECUTOR (content-keyed cache), not per
        // partition: at blocklist scale (P=100k ~ 1.5M nodes) 32
        // concurrent per-partition builds are a heap bomb
        val ac = cachedAutomaton(acKey, bc.value)
        it.flatMap { case (id, t) =>
          if (t == null) Iterator.empty
          else ac.containedIn(t).iterator.map(pi => (id, pi))
        }
      }.toDF(idCol, "__pi")
    val pdf = spark.createDataFrame(
      uniq.zipWithIndex.toSeq.map { case (p, i) => (i, p) }).toDF("__pi", "phrase")
    hits.join(broadcast(pdf), "__pi").select(col(idCol), col("phrase"))
  }
}
