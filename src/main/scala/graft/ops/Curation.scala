package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: PII
  * redaction, per-source caps, repetition scoring, and benchmark
  * contamination. These are the standard filters between "raw crawl"
  * and "training set" (C4/Gopher-style heuristics), built as narrow
  * codegen'd column expressions plus at most one shuffle each, so they
  * hold at 100 TB:
  *
  *   - `redactPii` / `repetitionFeatures`: per-row, zero shuffle.
  *   - `capPerKey`: one shuffle on the cap key.
  *   - `contamination`: distinct n-gram hashes joined on an 8-byte
  *     key; the benchmark side is broadcast (eval sets are small).
  */
object Curation {

  /** Redact emails, then IPv4 addresses, then phone numbers — in that
    * order so the phone pattern can never bite fragments of an address
    * already rewritten. Patterns stay inside the RE2-compatible subset
    * (character classes + bounded repeats + ASCII word boundaries) so
    * the same strings work in any engine.
    */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val PhoneRe = """\b\d{3}[-.]\d{3}[-.]\d{4}\b"""

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Line-ending + junk-character normalization patterns, shared with
    * the DuckDB oracle (RE2-compatible subset: \x escapes, classes,
    * no lookaround). `ControlRe` strips C0 controls EXCEPT tab (09)
    * and newline (0A) plus DEL (7F); CR never reaches it because
    * `CrlfRe` runs first. `ZeroWidthRe` drops the invisible web junk
    * (ZWSP/ZWNJ/ZWJ/BOM) that breaks tokenizers and dedup hashes. */
  val CrlfRe = "\r\n?"
  val ControlRe = """[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"""
  val ZeroWidthRe = """[\x{200B}-\x{200D}\x{FEFF}]"""

  /** Canonical text cleanup, the stage every crawl pipeline runs
    * before ANY hashing: CRLF/CR -> LF, strip C0 controls and
    * zero-width characters, then Unicode NFC composition — NFC LAST,
    * so a combining mark separated from its base by removed junk still
    * composes. Per-row, zero shuffle, fully whole-stage-codegen'd (the
    * NFC step is the native [[graft.functions.NfcNormalize]] kernel
    * with an allocation-free ASCII fast path, not a UDF). */
  def cleanText(text: Column): Column =
    graft.functions.NfcNormalize(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, CrlfRe, "\n"),
          ControlRe, ""),
        ZeroWidthRe, ""))

  /** Mojibake repair (UTF-8 read as Latin-1/cp1252, the ftfy fix) —
    * the stage BEFORE [[cleanText]]/NFC in a crawl pipeline: repair
    * first, normalize after (NFC of mojibake garbage is still
    * garbage). Conservative by construction — see
    * [[graft.functions.FixMojibakeK]] for the three safety gates. */
  def fixMojibake(text: Column): Column = graft.functions.FixMojibakeK(text)

  // --- HTML / markup stripping ---------------------------------------
  // The extraction stage UPSTREAM of every text op in a crawl pipeline
  // (C4/RefinedWeb/Dolma all start from an HTML-to-text pass): drop
  // non-content subtrees, turn block structure into line structure,
  // drop the remaining tags, decode entities. All patterns stay in the
  // RE2-compatible subset (lazy quantifiers + inline flags, NO
  // backreferences/lookaround) so the DuckDB oracle replays the
  // IDENTICAL strings — generated from these constants, not retyped.

  /** `<script>`/`<style>` elements WITH their contents (lazy, across
    * newlines). RE2 has no backreferences, so the two tag names are
    * spelled out as an alternation instead of `<(script|style)>...\1`. */
  val ScriptStyleRe: String =
    "(?is)<script\\b[^>]*>.*?</script\\s*>|<style\\b[^>]*>.*?</style\\s*>"
  /** Fallback for TRUNCATED crawl docs: an UNCLOSED `<script>`/`<style>`
    * (no matching close tag, so the paired [[ScriptStyleRe]] pass left
    * it alone) swallows everything to end-of-document — matching how a
    * browser treats an unterminated raw-text element, and keeping raw
    * script bodies out of clean_text. Runs AFTER the paired pass, so
    * properly closed elements are already gone. */
  val UnclosedScriptStyleRe: String =
    "(?is)<script\\b[^>]*>.*$|<style\\b[^>]*>.*$"
  /** HTML comments, lazy across newlines. */
  val CommentRe: String = "(?s)<!--.*?-->"
  /** Tags whose close (or self-close, for `<br>`) ends a rendered line. */
  val BreakTagRe: String =
    "(?i)<br\\s*/?>|</p\\s*>|</div\\s*>|</li\\s*>|</tr\\s*>|</h[1-6]\\s*>|</title\\s*>"
  /** Any remaining tag (after the block/comment passes). */
  val TagRe: String = "(?s)<[^>]*>"
  /** Ordered named/numeric entity decode table — `&amp;` LAST so an
    * ampersand it produces is never re-decoded (`&amp;lt;` must yield
    * the literal text `&lt;`, not `<`). Public so the DuckDB oracle is
    * GENERATED from the same rows (engines can't drift). */
  val EntityTable: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#34;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
  /** Whitespace normalization, in application order: horizontal runs
    * to one space, spaces hugging a newline dropped, 3+ newlines to a
    * blank line, leading/trailing whitespace trimmed. */
  val HSpaceRe: String = "[ \\t]+"
  val NlHugRe: String = " ?\\n ?"
  val NlRunRe: String = "\\n{3,}"
  val EdgeWsRe: String = "^\\s+|\\s+$"

  /** Strip HTML/XML markup down to rendered-ish text: remove
    * script/style subtrees and comments, turn block-closing tags into
    * newlines, drop remaining tags, decode common entities (ordered,
    * `&amp;` last), then normalize whitespace (horizontal runs to one
    * space, spaces hugging newlines dropped, 3+ newlines to a blank
    * line, trimmed). Entity decode runs AFTER tag removal, so textual
    * `&lt;tag&gt;` survives as literal `<tag>` — the standard order.
    * Narrow regexp chain, zero shuffle, whole-stage codegen. */
  def stripMarkup(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(html, ScriptStyleRe, ""),
        UnclosedScriptStyleRe, ""),
      CommentRe, "")
    val noTags = regexp_replace(
      regexp_replace(noBlocks, BreakTagRe, "\n"), TagRe, "")
    val decoded = EntityTable.foldLeft(noTags) {
      case (c, (ent, rep)) => regexp_replace(c, ent, rep)
    }
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(decoded, HSpaceRe, " "),
          NlHugRe, "\n"),
        NlRunRe, "\n\n"),
      EdgeWsRe, "")
  }

  // --- URL curation -------------------------------------------------
  // Web-crawl pipelines key their caps, dedup groups and source stats
  // on the REGISTERED DOMAIN of a normalized URL (C4, RefinedWeb,
  // Dolma all do); these three scalars are that chain. All are narrow
  // RE2-compatible regex expressions, zero shuffle, and every rule is
  // replayed verbatim by the DuckDB oracle (url_curation).

  /** Query parameters that identify a click, not a resource — the
    * standard strip set (utm_* plus the big ad/social click ids). */
  val TrackingParams: Seq[String] =
    Seq("utm_[a-z]+", "fbclid", "gclid", "msclkid", "igshid", "mc_eid")
  /** The params as one regex alternation — public so the DuckDB oracle
    * is GENERATED from the same table (engines can't drift). */
  def trackingAlternation: String = TrackingParams.mkString("(", "|", ")")
  private def trackAlt = trackingAlternation

  /** Multi-label public suffixes (curated subset of the Mozilla Public
    * Suffix List — the full PSL is ~9k rules and revisioned; pipelines
    * embed the subset that covers their crawl's mass and log the
    * rest). `registeredDomain` keeps one extra label above these. */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.nz", "org.nz", "net.nz", "govt.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.tw", "org.tw", "idv.tw", "com.hk", "org.hk", "edu.hk",
    "com.sg", "org.sg", "edu.sg", "com.my", "org.my",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.mx", "org.mx", "gob.mx", "com.ar", "com.tr", "com.ua",
    "com.pl", "net.pl", "org.pl", "co.za", "org.za", "web.za",
    "co.il", "org.il", "ac.il", "co.th", "or.th", "ac.th",
    "com.vn", "com.ph", "com.pk", "com.eg", "com.sa", "com.ng",
    "com.bd", "com.co", "com.pe", "com.cl", "com.ve")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"

  /** Canonicalize a URL: trim, drop the fragment, lowercase scheme and
    * host, strip the scheme's default port (:80 / :443), remove
    * tracking query parameters wherever they sit, and strip a bare
    * root-path trailing slash. Strings without a `scheme://` prefix
    * pass through (trimmed, fragmentless) — upstream crawls carry
    * those and guessing a scheme would forge data. Userinfo and
    * path-internal '&' are left alone (documented non-goals: the
    * former is dropped by [[urlHost]], the latter never collides with
    * the `?`/`&`-anchored tracking rules). */
  def normalizeUrl(url: Column): Column =
    TextAnalysis.once(regexp_replace(trim(url), "#.*$", "")) { u =>
      val scheme = lower(regexp_extract(u, SchemeRe, 1))
      val hp0 = lower(regexp_extract(u, SchemeRe, 2))
      val rest = regexp_extract(u, SchemeRe, 3)
      val hp = when(scheme === "http", regexp_replace(hp0, ":80$", ""))
        .when(scheme === "https", regexp_replace(hp0, ":443$", ""))
        .otherwise(hp0)
      // tracking params: '&'-prefixed anywhere, then a leading
      // '?param&' (promote the next param), then a lone '?param$'
      val s0 = concat(scheme, lit("://"), hp, rest)
      val s1 = regexp_replace(s0, s"&$trackAlt=[^&#]*", "")
      val s2 = regexp_replace(s1, s"\\?$trackAlt=[^&#]*&", "?")
      val s3 = regexp_replace(s2, s"\\?$trackAlt=[^&#]*$$", "")
      val s4 = regexp_replace(s3, "^([a-z][a-z0-9+.-]*://[^/?#]+)/$", "$1")
      when(scheme === "", u).otherwise(s4)
    }

  /** Lowercased host of a `scheme://` URL — userinfo and port
    * stripped; empty string when there is no scheme (no guessing). */
  def urlHost(url: Column): Column =
    lower(regexp_extract(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*).*$", 1))

  /** The registrable domain of a host: last two labels, or last three
    * when the last two are a known multi-label public suffix
    * ([[MultiLabelSuffixes]]). IPv4-looking hosts and hosts with fewer
    * than three labels return unchanged. */
  def registeredDomain(host: Column): Column =
    TextAnalysis.once(host) { h =>
      val labels = split(h, "\\.")
      val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
      val last3 = concat_ws(".",
        element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
      when(h.rlike("^[0-9.]+$") || size(labels) <= 2, h)
        .when(array_contains(
          lit(MultiLabelSuffixes.toArray), last2) && size(labels) >= 3, last3)
        .otherwise(last2)
    }

  /** Keep at most `n` rows per key, deterministically (lowest `ord`
    * first). One shuffle on `key`; ties on `ord` broken by `ord`'s
    * uniqueness being the caller's contract. Hot keys are bounded by
    * the cap itself on output; the sort under the window is per-key
    * and spills, so a skewed key degrades to disk, not OOM.
    */
  def capPerKey(df: DataFrame, key: Column, ord: Column, n: Int): DataFrame = {
    // collision-proof temp name: withColumn REPLACES an existing column,
    // so a caller-owned "__rn" would be silently corrupted
    val rn = Iterator.from(0).map(i => s"__rn$i")
      .find(c => !df.columns.contains(c)).get
    df.withColumn(rn, row_number().over(Window.partitionBy(key).orderBy(ord)))
      .filter(col(rn) <= n)
      .drop(rn)
  }

  /** Word-level repetition signals (Gopher-style): token count,
    * distinct-token count, and the duplicate fraction
    * 1 - distinct/total. Per-row narrow expression — the token array
    * never leaves the row.
    */
  def repetitionFeatures(text: Column): Column =
    TextAnalysis.once(TextAnalysis.tokens(text)) { toks =>
      val n = size(toks).cast("double")
      val d = size(array_distinct(toks)).cast("double")
      struct(
        n.cast("long").as("n_tokens"),
        d.cast("long").as("n_distinct"),
        round(lit(1.0) - d / greatest(n, lit(1.0)), 6).as("dup_ratio"))
    }

  /** Distinct word `n`-grams of `text`, hashed to 64 bits. The hash —
    * not the string — is what travels through joins: an 8-byte shuffle
    * key instead of a ~50-byte gram. STRICT grams: a text with fewer
    * than `n` tokens has no n-grams, so it can neither contaminate nor
    * be contaminated — the whole-text fallback would match unrelated
    * short texts against each other. Native one-pass kernel
    * ([[graft.functions.WordGramHashes]]) — no per-window string
    * materialization. */
  private def gramHashes(text: Column, n: Int): Column =
    graft.functions.WordGramHashes(text, n, distinct = true)

  /** Benchmark-contamination check: for every corpus document, how many
    * of its distinct word `n`-grams appear anywhere in `benchmark`.
    * Returns (idCol, shared_grams) for contaminated docs only.
    *
    * Scale shape: both sides reduce to DISTINCT n-gram hashes before
    * the join; the benchmark side (an eval set — thousands of docs, not
    * billions) is broadcast, so the corpus never shuffles: explode +
    * broadcast-hash-join + partial-agg count, all map-side until the
    * final per-doc count combine.
    */
  def contamination(corpus: DataFrame, corpusId: String, corpusText: String,
      benchmark: DataFrame, benchmarkText: String, n: Int = 8): DataFrame = {
    val benchGrams = benchmark
      .select(explode(gramHashes(col(benchmarkText), n)).as("g"))
      .distinct()
    val corpusGrams = corpus
      .select(col(corpusId), explode(gramHashes(col(corpusText), n)).as("g"))
    corpusGrams
      .join(broadcast(benchGrams), "g")
      .groupBy(col(corpusId))
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** Bloom-gated decontamination — EXACTLY the [[contamination]]
    * semantics behind a Bloom prefilter (the GPT-3/Llama-style n-gram
    * membership screen). The benchmark's distinct gram hashes
    * aggregate into one Bloom filter (`DataFrame.stat.bloomFilter` —
    * a distributed build, merged on the driver) that is BROADCAST and
    * probed locally: the 100 TB corpus is screened in a single
    * narrow pass with NO join and NO shuffle, and only flagged docs —
    * true hits plus the fpp-bounded false positives — reach the exact
    * verification join. Blooms admit no false negatives, so the
    * output provably equals [[contamination]] row for row; the
    * verification stage exists to kill the false positives.
    *
    * Scale shape: at 100M benchmark grams and the 1e-6 default fpp
    * the bloom is ~420 MB — well under the exact hash set the
    * broadcast join in [[contamination]] would ship — and the corpus
    * side does zero data movement. Flagged docs carry their gram
    * arrays FORWARD into verification (no second corpus scan); the
    * verification join is left to AQE, which broadcasts whichever
    * side is measured smaller at runtime. Probe/flag volumes surface
    * as Stats counters `decontam.bloom_docs_probed` / `_flagged`.
    *
    * fpp is PER GRAM; a clean doc with G grams is flagged with
    * probability ~G*fpp, so the default is 1e-6, not the textbook
    * 0.01 — measured on the 10x rehearsal corpus (~200 grams/doc),
    * fpp=0.01 flagged 58% of the corpus into verification while 1e-6
    * flags the true hits plus noise, at only ~3.5x the bloom bits.
    *
    * `expectedGrams` sizes the bloom; when < 0 it is counted with one
    * pass over the (small) benchmark side. */
  def bloomContamination(corpus: DataFrame, corpusId: String, corpusText: String,
      benchmark: DataFrame, benchmarkText: String, n: Int = 8,
      fpp: Double = 1e-6, expectedGrams: Long = -1L): DataFrame = {
    val spark = corpus.sparkSession
    // materialized once: the distinct gram set feeds the count, the
    // bloom build AND the verification join (three consumers — without
    // this the benchmark explode+distinct runs three times)
    val benchGrams = benchmark
      .select(explode(gramHashes(col(benchmarkText), n)).as("g"))
      .distinct()
      .localCheckpoint(true)
    val expected = if (expectedGrams > 0) expectedGrams else benchGrams.count()
    val bloom = benchGrams.stat.bloomFilter("g", math.max(expected, 1L), fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val probed = graft.core.Stats.counter(spark, "decontam.bloom_docs_probed")
    val flagged = graft.core.Stats.counter(spark, "decontam.bloom_docs_flagged")
    val withGrams = corpus.select(col(corpusId), gramHashes(col(corpusText), n).as("__gs"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      withGrams.schema.head,
      withGrams.schema("__gs")))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    val cands = withGrams.mapPartitions { rows =>
      val b = bc.value
      rows.flatMap { r =>
        probed.add(1L)
        val gs = r.getSeq[Long](1)
        if (gs != null && gs.exists(b.mightContainLong)) {
          flagged.add(1L); Some(Row(r.get(0), gs))
        } else None
      }
      // localCheckpoint pins the probe pass to exactly one execution:
      // without it the downstream join stage re-runs this scan on task
      // retry / speculation and the probed/flagged counters over-count
      // past the corpus size (counters in a recomputed lineage are
      // at-least-once). The materialized set is only the FLAGGED docs
      // plus their gram arrays — contamination-rate sized, not corpus
      // sized — so the pin is cheap at any scale.
    }.localCheckpoint(true)
    cands.select(col(corpusId), explode(col("__gs")).as("g"))
      .join(benchGrams, "g") // AQE picks the build side at runtime
      .groupBy(col(corpusId))
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** Cross-document duplicate-span detection (the boilerplate signal
    * behind "dedup the substrings, not just the documents"): for every
    * doc, the fraction of its distinct word `n`-gram windows that also
    * appear in at least one OTHER doc. High `dup_fraction` with no
    * whole-doc near-dup = shared boilerplate (headers, licenses,
    * navigation) worth stripping before training.
    *
    * Scale shape (revised round 11 — the old full-count join was the
    * worst curve in the 100x rehearsal, 4.9x time for 3.3x data):
    * docs reduce to distinct 8-byte gram hashes (the string never
    * shuffles); `n_grams` is a NARROW per-row count (no join at all);
    * `shared_grams` is a LEFT SEMI join against only the grams with
    * doc-count >= 2 — the shared set, typically a small fraction of
    * the vocabulary, materialized by an AQE-remeasured aggregation so
    * the runtime can broadcast it when it is small and fall back to a
    * payload-free merge join when it is not. The old shape joined
    * every gram row against the FULL per-gram count table (corpus
    * joined to whole-vocabulary, count payload riding every row) —
    * never broadcastable, superlinear in practice. Docs shorter than
    * `n` tokens have no windows and do not appear (strict-gram
    * semantics, as in [[contamination]]). */
  def dupSpans(df: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val grams = df.select(col(idCol), explode(gramHashes(col(textCol), n)).as("g"))
    // grams are DISTINCT per doc, so the per-gram row count IS the
    // number of docs containing the gram; only the >= 2 SET survives
    // into the join build side
    val shared = grams.groupBy("g").agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= 2).select(col("g"), lit(1L).as("__s"))
    grams.join(shared, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__s"), lit(0L))).as("shared_grams"))
      .withColumn("dup_fraction",
        round(col("shared_grams").cast("double") / col("n_grams"), 6))
  }

  /** Corpus-wide duplicate-SPAN removal with keep-first semantics —
    * the "deduplicate the substrings, not just the documents" pass
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"): every word `n`-gram window that occurs more than
    * once in the corpus (across documents OR repeated inside one)
    * survives only at its globally first occurrence — smallest
    * (doc id, token position) — and every other occurrence has its
    * `n` tokens removed. Overlapping duplicated windows union their
    * removed ranges, so a long shared passage disappears as a block
    * while its single keeper copy stays readable. Returns (idCol,
    * clean_text, n_tokens, n_removed) for EVERY input doc;
    * `clean_text` is the surviving tokens joined by single spaces
    * (whitespace-normalized, like the tokenizer that defined the
    * windows). Docs shorter than `n` tokens pass through untouched
    * (strict-gram semantics, as in [[contamination]]).
    *
    * Scale shape: unlike [[dupSpans]] (distinct grams only), removal
    * needs every OCCURRENCE, so the corpus tokenizes into one
    * window-per-token stream — 8-byte xxhash64 keys plus (id, pos),
    * never the gram string — and shuffles ONCE on the gram to find
    * each gram's occurrence count and first occurrence (a single
    * partial-aggregated groupBy: min(struct(id, pos)) + count). Only
    * grams with count >= 2 — the duplicated set, small by nature but
    * legitimately unbounded at web scale — survive into the mark
    * join, which broadcasts only under the HONEST corpus-size gate
    * ([[Dedup.corpusJoinSide]]) and otherwise pins a shuffle-on-key
    * merge join. Removed windows re-expand to covered token indices
    * (a bounded `n`-way explode, linear), and the per-doc
    * reconstruction on idCol is the same one-exchange
    * collect-and-sort [[removeBoilerplate]] uses. Matching on the
    * 64-bit hash rather than the gram string is the repo's standard
    * trade: one mislabeled window in ~2^64 versus shipping full gram
    * text through the corpus-wide shuffle. */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 2, s"window $n must be >= 2")
    val corpusSide = Dedup.corpusJoinSide(df)
    val toks = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
    // native one-pass window hashes in token-position order (the HOF
    // slice+concat_ws chain re-materializes every window string)
    val wins = df.select(col(idCol), posexplode(
        graft.functions.WordGramHashes(col(textCol), n, distinct = false))
      .as(Seq("pos", "g")))
    // one shuffle on the gram: first occurrence + occurrence count
    val keepers = wins.groupBy("g")
      .agg(min(struct(col(idCol).as("kid"), col("pos").as("kpos"))).as("__k"),
        count(lit(1)).as("__occ"))
      .filter(col("__occ") >= 2)
      .select(col("g"), col("__k.kid").as("__kid"), col("__k.kpos").as("__kpos"))
    // duplicated occurrences that are NOT the keeper mark their window
    val removed = wins.join(corpusSide(keepers), Seq("g"))
      .filter(!(col(idCol) === col("__kid") && col("pos") === col("__kpos")))
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (n - 1)))
        .as("__ti"))
      .distinct()
    val tokRows = toks.select(col(idCol), posexplode(col("__t")).as(Seq("__ti", "__tok")))
    val rebuilt = tokRows.join(removed, Seq(idCol, "__ti"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__ti"), col("__tok")))),
          x => x.getField("__tok")), " ").as("clean_text"),
        count(lit(1)).as("__kept"))
    // left from the full doc set: a doc whose every token was removed
    // still comes back, with clean_text = ""
    toks.select(col(idCol), size(col("__t")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__kept"), lit(0L))).as("n_removed"))
  }

  /** C4-style boilerplate-line removal: a line whose TRIMMED form
    * appears in at least `minDocs` distinct documents is boilerplate
    * (nav bars, cookie banners, footers) and is stripped from every
    * document; everything else — including blank lines, which are
    * never counted and never removed — survives in original order.
    * Returns (idCol, clean_text, n_lines, n_removed) for every input
    * doc; a doc whose every line is boilerplate comes back with
    * clean_text = "".
    *
    * Scale shape: the counting side ships only 8-byte xxhash64 keys
    * (hash BEFORE the per-doc distinct, so line strings never leave
    * the map side); the count table is filtered to `__docs >=
    * minDocs` — the boilerplate set, small by nature — so AQE
    * broadcasts the mark join and the exploded text reaches exactly
    * ONE exchange, the per-doc reconstruction on idCol. The broadcast
    * is gated on the HONEST input size ([[Dedup.corpusJoinSide]] —
    * Catalyst's estimate for a derived aggregate is fiction): above
    * the budget the mark join pins a shuffle-on-key merge join, the
    * always-safe shape, because at web scale the distinct
    * repeated-line table is legitimately unbounded. Matching on the
    * 64-bit hash rather than the string is deliberate (same trade
    * as [[contamination]]): a collision mislabels one line in ~2^64,
    * and the alternative ships full line text through a corpus-wide
    * shuffle. */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 5): DataFrame = {
    require(minDocs >= 2, s"minDocs $minDocs must be >= 2")
    val corpusSide = Dedup.corpusJoinSide(df)
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val keyed = lines.filter(trim(col("line")) =!= "")
      .select(col(idCol), xxhash64(trim(col("line"))).as("k")).distinct()
    val boiler = keyed.groupBy("k").agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= minDocs).select("k")
    lines.withColumn("k", xxhash64(trim(col("line"))))
      .join(corpusSide(boiler.withColumn("__boiler", lit(true))),
        Seq("k"), "left_outer")
      .withColumn("__keep", col("__boiler").isNull || trim(col("line")) === "")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_lines"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_removed"))
  }

  /** Corpus-wide exact paragraph dedup with KEEP-FIRST semantics
    * (Dolma-style): a paragraph (split on a blank line, matched on its
    * TRIMMED form) survives only at its globally first occurrence —
    * smallest (doc, position) — and is stripped everywhere else,
    * including later repeats inside the same document. Empty
    * paragraphs (consecutive separators) are never matched and never
    * removed, so surviving structure reassembles faithfully. Returns
    * (idCol, clean_text, n_paragraphs, n_removed) for every input doc.
    *
    * This is the complement of [[removeBoilerplate]]: boilerplate
    * removal strips a high-frequency line from EVERY doc; paragraph
    * dedup keeps exactly ONE copy of every repeated span, the standard
    * pre-training pass between exact doc-level dedup (misses partial
    * overlap) and shingle LSH (pays signature cost).
    *
    * Scale shape: the first-occurrence table groups 8-byte xxhash64
    * keys to a min (doc, pos) struct — map-side-combined, strings never
    * shuffle — and the mark join lands on the SAME key the aggregate
    * just partitioned by, so Catalyst reuses the exchange (one
    * effective shuffle on k, one on idCol for reconstruction). The
    * first-occurrence side is every distinct paragraph in the corpus —
    * unbounded at web scale — so it rides [[Dedup.corpusJoinSide]]:
    * never broadcast above the honest-size budget, merge join pinned.
    * Hash-matching trade as [[removeBoilerplate]]: ~2^-64 collision
    * odds against shipping full paragraph text through the shuffle. */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val corpusSide = Dedup.corpusJoinSide(df)
    val paras = df.select(col(idCol),
      posexplode(split(col(textCol), "\n\n")).as(Seq("pos", "para")))
    val first = paras.filter(trim(col("para")) =!= "")
      .select(xxhash64(trim(col("para"))).as("k"),
        struct(col(idCol).as("id"), col("pos").as("pos")).as("o"))
      .groupBy("k").agg(min(col("o")).as("__first"))
    paras.withColumn("k", xxhash64(trim(col("para"))))
      .join(corpusSide(first), Seq("k"), "left_outer")
      .withColumn("__keep", trim(col("para")) === "" ||
        (col("__first").getField("id") === col(idCol) &&
          col("__first").getField("pos") === col("pos")))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("pos"), col("para"))))),
          x => x.getField("para")), "\n\n").as("clean_text"),
        count(lit(1)).as("n_paragraphs"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_removed"))
  }

  /** Deterministic REPRODUCIBLE sampling: keep a row iff the md5 of
    * (salt || id) lands below `fraction` of the 24-bit prefix space.
    * Unlike `df.sample`, the decision is a pure function of the id and
    * salt — independent of partitioning, task retries, cluster size, or
    * Spark version — which is what makes a 100 TB training-mixture
    * reproducible (and auditable by ANY engine that has md5: the DuckDB
    * oracle recomputes membership row by row). Per-row narrow
    * predicate, zero shuffle, fully pushdown-friendly. */
  def sampleHash(idCol: Column, fraction: Double, salt: String): Column = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    // 24-bit space: exact integer threshold, no float rounding
    // ambiguity; floor semantics match mixtureSample's CAST-to-long
    val threshold = (fraction * (1 << 24)).toLong
    conv(substring(md5(concat(lit(salt), idCol.cast("string")).cast("binary")), 1, 6),
      16, 10).cast("long") < lit(threshold)
  }

  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "graft"): DataFrame =
    df.filter(sampleHash(col(idCol), fraction, salt))

  /** Deterministic WEIGHTED sampling without replacement (the
    * Efraimidis–Spirakis A-ES scheme): keep the k rows with the
    * largest u^(1/w), where u is the same md5-24-bit uniform as
    * [[sampleHash]] — P(row i in sample) is proportional-to-weight
    * without replacement, and the decision is a pure function of
    * (id, weight, salt): reproducible across partitioning, retries
    * and engines (the DuckDB oracle replays the key formula row by
    * row). The training-mixture use: sample documents proportional to
    * token count / quality score without a shuffle-heavy stratify.
    *
    * Scale shape: key is one narrow expression; the rank is
    * sort+limit, which Spark executes as TakeOrderedAndProject —
    * per-partition bounded heaps of k rows merged on the driver, NO
    * global sort, NO shuffle of the corpus. Rows with weight <= 0 or
    * null are excluded (they carry no sampling mass). Ties (same key,
    * possible only for duplicated ids) break by id. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("__wkey"),
      "input already has a __wkey column (scratch name collision)")
    val h = conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))
      .cast("binary")), 1, 6), 16, 10).cast("long")
    // u in (0,1): +0.5 keeps 0 out so pow(u, 1/w) never collapses
    val u = (h.cast("double") + lit(0.5)) / lit((1 << 24).toDouble)
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("__wkey", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("__wkey").desc, col(idCol).asc)
      .limit(k)
      .drop("__wkey")
  }

  /** Deterministic train/val/test assignment: the md5-24-bit hash of
    * (salt || key) lands in one of the cumulative `weights` buckets.
    * Same reproducibility contract as [[sampleHash]] — a pure function
    * of key and salt, independent of partitioning/retries/cluster
    * size, recomputable by any engine with md5 (the DuckDB oracle
    * does). Zero shuffle: one narrow expression. */
  def splitColumn(keyCol: Column, weights: Seq[(String, Double)],
      salt: String = "graft"): Column = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) &&
      math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must be non-negative and sum to 1: $weights")
    val h = conv(substring(md5(concat(lit(salt), keyCol.cast("string"))
      .cast("binary")), 1, 6), 16, 10).cast("long")
    val cuts = weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * (1 << 24)).toLong)
    weights.map(_._1).zip(cuts).dropRight(1)
      .foldRight(lit(weights.last._1)) { case ((name, cut), els) =>
        when(h < cut, name).otherwise(els)
      }
  }

  /** Leakage-free split: near-duplicate CLUSTERS are assigned to splits
    * atomically, so an eval doc can never have a near-copy in train —
    * the contamination mode a plain per-doc split invites. One LSH
    * pass + clustering over the corpus ([[Dedup.dupClusters]]); every
    * doc hashes on its CLUSTER id (singleton docs on their own id,
    * which equals their cluster root). Adds a `split` column. */
  def leakageFreeSplit(df: DataFrame, idCol: String, textCol: String,
      weights: Seq[(String, Double)], threshold: Double = 0.7,
      salt: String = "graft"): DataFrame = {
    val pairs = Dedup.minhashNearDups(df, idCol, textCol, threshold = threshold)
    val clusters = Dedup.dupClusters(pairs)
      .withColumnRenamed("id", idCol).withColumnRenamed("cluster", "__cl")
    df.join(clusters, Seq(idCol), "left")
      .withColumn("__key", coalesce(col("__cl"), col(idCol)))
      .withColumn("split", splitColumn(col("__key"), weights, salt))
      .drop("__cl", "__key")
  }

  /** Mixture sampling: per-source fractions in one pass — the
    * "re-weight my training mixture" op (e.g. downsample web crawl to
    * 30%, keep code at 100%). Sources absent from `fractions` keep
    * `defaultFraction`. Same deterministic hash membership as
    * [[deterministicSample]]; the per-source threshold is a broadcast
    * CASE over a small literal map, so the corpus stays a narrow
    * zero-shuffle scan. */
  def mixtureSample(df: DataFrame, sourceCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (src, f)) =>
      when(col(sourceCol) === src, lit(f)).otherwise(acc)
    }
    val threshold = (frac * lit((1 << 24).toDouble)).cast("long")
    df.filter(conv(substring(
        md5(concat(lit(salt), col(idCol).cast("string")).cast("binary")), 1, 6),
      16, 10).cast("long") < threshold)
  }

  /** Token-proportional mixture ("30% web, 50% code, 20% books — BY
    * TOKENS"): down-sample each source so the kept token mass follows
    * `targetShares`, water-filled — the binding source (smallest
    * tokens/share ratio) keeps everything and the others scale down to
    * match, so no rate ever exceeds 1 and the shares hold exactly in
    * expectation. Rates derive from the EXACT per-source token totals
    * (one tiny aggregate — the only corpus pass besides the filter
    * itself); the keep decision is the usual md5 pure function of
    * (salt, id) — partitioning/retry/cluster independent and
    * any-engine recomputable, so the whole op sits under a hash-exact
    * oracle. Sources absent from `targetShares` are dropped. */
  def tokenMixtureSample(df: DataFrame, sourceCol: String, idCol: String,
      tokenCol: String, targetShares: Map[String, Double],
      salt: String = "graft"): DataFrame = {
    require(targetShares.nonEmpty && targetShares.values.forall(_ > 0) &&
      math.abs(targetShares.values.sum - 1.0) < 1e-9,
      s"target shares must be positive and sum to 1: $targetShares")
    val totals = df.filter(col(sourceCol).isin(targetShares.keys.toSeq: _*))
      .groupBy(sourceCol).agg(sum(col(tokenCol)).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(targetShares.keys.forall(s => totals.getOrElse(s, 0L) > 0L),
      s"every target source needs tokens; totals: $totals")
    // water-fill: the max total T with every rate <= 1
    val capacity = targetShares.map { case (s, sh) => totals(s).toDouble / sh }.min
    val rates = targetShares.map { case (s, sh) =>
      s -> sh * capacity / totals(s).toDouble
    }
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (s, r)) => when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(samplingHash(col(idCol), salt) <
      (rate * lit((1 << 24).toDouble)).cast("long"))
  }

  /** The md5-24-bit sampling hash shared by the deterministic sampling
    * family — exposed so rank-based samplers use the SAME recomputable
    * ordering contract as the membership-based ones. */
  def samplingHash(idCol: Column, salt: String = "graft"): Column =
    conv(substring(md5(concat(lit(salt), idCol.cast("string")).cast("binary")), 1, 6),
      16, 10).cast("long")

  /** Balanced per-class sample: the `n` rows with the LOWEST sampling
    * hash in each class — the "give me 10k docs per language/domain for
    * a balanced eval/fine-tune set" op, deterministic under the usual
    * contract (pure function of id and salt, any-engine recomputable).
    *
    * Unlike [[capPerKey]] (a per-key window: every row crosses the
    * key shuffle and sorts), the selection runs on bounded
    * per-partition heaps ([[Similarity.topKPerKey]]): each partition
    * contributes at most `n` (id, hash) rows per class, so the only
    * corpus-scale shuffle is the final broadcast semi-join of the
    * picked ids. Class count is small by contract (languages, sources
    * — the broadcast is |classes| * n ids); a high-cardinality class
    * column belongs in [[capPerKey]] instead. */
  def stratifiedSample(df: DataFrame, classCol: String, idCol: String,
      n: Int, salt: String = "graft"): DataFrame = {
    // topKPerKey keeps the HIGHEST score first: negate the hash so
    // "lowest hash" wins; ties (24-bit collisions) break on id asc,
    // matching ORDER BY hash, id in any replaying engine
    val picked = graft.ops.Similarity.topKPerKey(
      df.select(col(classCol).as("__cls"), col(idCol).as("__id"),
        negate(samplingHash(col(idCol), salt)).cast("double").as("__s")),
      "__cls", "__id", "__s", n)
      .select(col("__id").as(idCol))
    df.join(broadcast(picked), Seq(idCol), "left_semi")
  }

  /** Token-budget corpus selection: per source, keep the greedy
    * hash-ordered prefix of rows whose cumulative `tokensCol` stays
    * within `budget` — "give me ~N tokens per source" for mixture
    * construction, deterministic and any-engine replayable (a window
    * cumsum over ORDER BY hash, id).
    *
    * Scale shape: sources whose TOTAL already fits the budget bypass
    * the window entirely (one tiny per-source aggregate decides — no
    * sort, no shuffle beyond the aggregate), so the per-source
    * sort-window is paid only by the sources actually being cut. With
    * few giant sources that remaining sort is the honest cost of an
    * exact greedy prefix; an approximate variant would estimate a
    * hash threshold from a token histogram instead. */
  def tokenBudgetSample(df: DataFrame, sourceCol: String, idCol: String,
      tokensCol: String, budget: Long, salt: String = "graft"): DataFrame = {
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).as("__tot"))
      .filter(col("__tot") > budget)
      .select(col(sourceCol))
    val under = df.join(broadcast(totals), Seq(sourceCol), "left_anti")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(samplingHash(col(idCol), salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val capped = df.join(broadcast(totals), Seq(sourceCol), "left_semi")
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
    under.unionByName(capped).select(df.columns.map(col): _*)
  }
}
