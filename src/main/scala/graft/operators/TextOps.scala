package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All pure Column expressions (whole-stage codegen, no UDFs) so they
  * run at scan speed over 100 TB of documents; every operator has a
  * DuckDB-oracle query in [[graft.queries.TrainQueries]].
  */
object TextOps {

  /** Whitespace tokens; empty text → empty array (split would yield [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer count: letter runs, single digits, single
    * punctuation marks — the usual byte-pair pre-split shape.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  val StopWords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "in", "to", "is", "it")

  def stopwordHits(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(StopWords)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))

  /** Gopher quality rules (Rae et al. 2021, Appendix A — the public
    * heuristic battery most pretraining pipelines start from): word
    * count bounds, mean word length bounds, symbol ratio, alphabetic-
    * word ratio, and minimum stopword hits, each reported per document
    * plus the conjunction. One scan, token array materialized once
    * (the interpreted-lambda discipline), all integer/round6 exact.
    *
    * @return (idCol, n_words, mean_word_len, symbol_ratio, alpha_ratio,
    *         n_stop, pass)
    */
  def gopherRules(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    val d = docs.withColumn("__toks", tokens(col(textCol)))
    val nW = size(col("__toks")).cast("long")
    // integer char-count fold — order-free exact
    val sumLen = aggregate(col("__toks"), lit(0L), (a, t) => a + length(t))
    val meanLen = round(sumLen.cast("double") /
      greatest(nW, lit(1L)).cast("double"), 6)
    val symRatio = round(punctCount(col(textCol)).cast("double") /
      greatest(length(col(textCol)), lit(1)).cast("double"), 6)
    val alphaRatio = round(
      size(filter(col("__toks"), t => t.rlike("[A-Za-z]"))).cast("double") /
        greatest(nW, lit(1L)).cast("double"), 6)
    val nStop = stopwordHits(col("__toks")).cast("long")
    d.select(col(idCol), nW.as("n_words"), meanLen.as("mean_word_len"),
        symRatio.as("symbol_ratio"), alphaRatio.as("alpha_ratio"),
        nStop.as("n_stop"))
      .withColumn("pass",
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") < 0.1 &&
          col("alpha_ratio") > 0.8 &&
          col("n_stop") >= 2)
  }

  /** C4-style blocklist hit count: occurrences of blocklisted tokens
    * (case-insensitive whole-token match — C4 drops any page with ≥1
    * hit from its public badwords list). A broadcast-literal isin over
    * the token array: stateless, codegen-visible, no join.
    */
  def blocklistHits(toks: Column, blocklist: Seq[String]): Column =
    size(filter(toks, t => lower(t).isInCollection(blocklist.map(_.toLowerCase))))

  /** Quality score in [0,1]: length saturation + non-punct ratio +
    * stopword presence — the standard cheap pre-filter trio for corpus
    * cleaning (cf. C4/Gopher-style heuristics, re-expressed as columns).
    */
  def qualityScore(text: Column): Column =
    // let-bind the token array: the formula reads it three times, and
    // stopwordHits' filter() lambda keeps this projection interpreted,
    // where repeated subexpressions re-tokenize per reference
    element_at(
      transform(array(tokens(text)), toks => {
        val nTok = size(toks).cast("double")
        val lenScore = least(nTok / lit(50.0), lit(1.0))
        val punctRatio = punctCount(text).cast("double") /
          greatest(length(text).cast("double"), lit(1.0))
        val stopRatio = stopwordHits(toks).cast("double") / greatest(nTok, lit(1.0))
        round(lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - punctRatio) +
          lit(0.3) * least(stopRatio * lit(5.0), lit(1.0)), 6)
      }),
      1)

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose — the operator shape (per-language score
    * + argmax) is the deliverable; swap richer profiles in production.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "die", "und", "ist", "mit"),
    "fr" -> Seq("le", "la", "et", "est", "avec"),
    "es" -> Seq("el", "los", "y", "es", "con"))

  /** Distinct marker hits per language; ties resolved by declaration
    * order; CJK codepoints short-circuit to "zh"; no hits → "und".
    */
  def langId(text: Column): Column = {
    // let-bind the distinct token array: the per-language scores each
    // read it, and an inline expression would re-tokenize once per
    // LANGUAGE under interpreted higher-order eval (cf. qualityScore)
    val ordered = element_at(
      transform(array(array_distinct(tokens(lower(text)))), d => {
        val scores = LangMarkers.map { case (lang, markers) =>
          lang -> size(array_intersect(d, array(markers.map(lit): _*)))
        }
        val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
        // left-to-right priority: first declared language wins ties
        scores.foldLeft(Option.empty[Column]) {
          case (None, (lang, s)) => Some(when(s === best && s > 0, lit(lang)))
          case (Some(c), (lang, s)) => Some(c.when(s === best && s > 0, lit(lang)))
        }.get.otherwise(lit("und"))
      }),
      1)
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh")).otherwise(ordered)
  }

  /** CCNet-style language SEGMENTATION (the public CCNet design runs
    * langid per LINE and keeps/splits documents by the per-span
    * verdicts — a crawl document is routinely multilingual and one
    * doc-level label miscurates it): the token stream cut into fixed
    * `window`-token spans, each span langId'd, rolled up per doc to
    * the dominant span language, span/language counts and the mixed
    * flag. Fixed windows rather than line splits because the span
    * BOUNDARY definition is orthogonal to the operator shape (swap a
    * line splitter in where corpora have line structure).
    *
    * One tokenize scan; spans explode row-locally (no shuffle until
    * the per-doc rollup, which shuffles doc-sized keys). Docs with no
    * tokens drop (no span to classify).
    *
    * @return (idCol, n_spans, n_langs, lang_major, mixed); ties on
    *         the dominant language break to the lexicographically
    *         first
    */
  def langSegments(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", window: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 1)
    val base = docs
      .select(col(idCol), tokens(lower(col(textCol))).as("__t"))
      .filter(size(col("__t")) > 0)
    val spans = base.select(col(idCol), explode(transform(
        sequence(lit(0), ((size(col("__t")) - 1) / window).cast("int")),
        i => array_join(slice(col("__t"), i * window + 1, lit(window)), " ")))
        .as("__stext"))
      .select(col(idCol), langId(col("__stext")).as("lang_span"))
    val counts = spans.groupBy(col(idCol), col("lang_span"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__c").desc, col("lang_span"))
    counts
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_spans"),
        count(lit(1)).as("n_langs"),
        max(when(col("__rn") === 1, col("lang_span"))).as("lang_major"))
      .withColumn("mixed", col("n_langs") > 1)
  }

  /** Document fingerprint: md5 of the casefolded, whitespace-collapsed
    * text. Stable across engines (same bytes → same hex) — the exact-dedup
    * key at corpus scale (32-byte shuffle key instead of full text).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** PII redaction patterns, applied in this order (emails before
    * phones, so an address's digits can't half-match the phone rule).
    * Deliberately RE2-safe (no backreferences or lookaround) so Java
    * regex and RE2-based engines (DuckDB, Go) match identically —
    * redaction must produce the SAME text everywhere or fingerprints
    * diverge between the redacting pipeline and downstream dedup.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "[+(]?[0-9][0-9()\\- ]{6,}[0-9]" -> "<PHONE>")

  /** Redact emails, URLs and phone-like digit runs — the standard
    * pre-training PII scrub, as a chained codegen'd `regexp_replace`
    * (one scan, no UDFs).
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }

  /** Count of matches per PII class, for corpus-level leak auditing. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(PiiPatterns(0)._1)),
    "n_url" -> regexp_count(text, lit(PiiPatterns(1)._1)),
    "n_phone" -> regexp_count(text, lit(PiiPatterns(2)._1)))

  /** Crude HTML → text extraction: the standard first pass over crawled
    * pages (the heavy-ML readability extractors sit on top of exactly
    * this skeleton). Drops `<script>`/`<style>` blocks WITH their
    * contents, strips every remaining tag, unescapes the five
    * ubiquitous entities plus `&nbsp;` (`&amp;` last, so `&amp;lt;`
    * correctly yields the literal `&lt;`), and collapses runs of
    * whitespace. Pure `regexp_replace` chain — codegen'd, no UDF —
    * using RE2-compatible patterns only (no backreferences: each block
    * tag gets its own pattern), so the DuckDB oracle replays it
    * verbatim.
    */
  def htmlToText(html: Column): Column = {
    val noBlocks = Seq("script", "style").foldLeft(html) { (acc, t) =>
      regexp_replace(acc, s"(?is)<$t[^>]*>.*?</$t>", " ")
    }
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, c)) => regexp_replace(acc, e, c) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Power-of-two length bucket: `floor(log2(n)) + 1` computed exactly
    * as the binary-string length (no floating log — log implementations
    * differ across engines; string length of `bin(n)` doesn't). Bucket
    * b >= 1 holds n in [2^(b-1), 2^b); n <= 0 (empty docs, defensive
    * negatives) lands in its own bucket 0 — `bin()` would otherwise
    * conflate n=0 with n=1 and map negatives to bucket 64 via
    * two's-complement. The standard corpus length-distribution
    * histogram axis.
    */
  def lengthBucket(n: Column): Column = {
    val nl = n.cast("long")
    when(nl <= 0, lit(0)).otherwise(length(bin(nl)))
  }

  /** Word n-gram shingle set (distinct), the near-dup unit.
    * 1-based `slice`/`sequence` mirror the oracle's 1-based list ops.
    *
    * The token array is let-bound as a lambda variable (single-element
    * `transform`) — in interpreted higher-order eval, referencing an
    * inline `tokens(text)` from inside the shingle lambda would re-run
    * the whole tokenizer once PER SHINGLE; a lambda variable is a cheap
    * slot read.
    */
  def wordShingles(text: Column, n: Int): Column =
    element_at(
      transform(array(tokens(text)), toks =>
        when(size(toks) < n, array().cast("array<string>"))
          .otherwise(array_distinct(transform(
            sequence(lit(1), size(toks) - lit(n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n))))))),
      1)

  /** Spark's `trim` strips ONLY space characters (0x20) — not tabs or
    * newlines like Java's `String.trim`. The compiled shingle twin must
    * replicate that exactly or tab/newline-edged text (common in crawled
    * corpora) shingles differently in the UDF than in the Column form
    * and the DuckDB oracles.
    */
  private def sparkTrim(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Compiled twin of [[wordShingles]] — bit-identical output
    * (distinct word n-grams in first-occurrence order, single-space
    * joined). Higher-order column functions evaluate interpreted with
    * per-element allocation; a while-loop UDF is the difference between
    * the shingle step dominating a dedup pipeline and disappearing into
    * the scan (cf. minhashSignatureUdf). Use this in batch hot paths;
    * keep the Column form where expressions must stay codegen-visible.
    *
    * Twin semantics pinned deliberately: space-only trim ([[sparkTrim]])
    * and a limit=-1 split (Spark's 2-arg `split` keeps trailing empty
    * tokens; Java's default limit 0 drops them) — so `"\thello world\n"`
    * tokenizes to `["", "hello", "world", ""]` in both forms.
    */
  def wordShinglesUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      val t = if (text == null) "" else sparkTrim(text)
      if (t.isEmpty) Seq.empty[String]
      else {
        val toks = t.split("\\s+", -1)
        if (toks.length < n) Seq.empty[String]
        else {
          val seen = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i + n <= toks.length) {
            val sb = new StringBuilder(toks(i))
            var j = 1
            while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
            seen.add(sb.toString)
            i += 1
          }
          import scala.jdk.CollectionConverters._
          seen.iterator().asScala.toSeq
        }
      }
    }

  /** Rolling polynomial (Karp-Rabin) hash per word — used as MinHash's
    * base hash; codegen-friendly (crc32 over the utf8 bytes).
    */
  def wordHash(word: Column): Column = crc32(encode(word, "UTF-8"))

  /** Repetition ratio (Gopher-style repetition filter, public
    * literature): fraction of word n-gram occurrences that are
    * repeats of an earlier n-gram in the SAME document —
    * `1 - distinct/total`. High values flag boilerplate/spam. Note
    * [[wordShingles]] is the distinct set; this needs totals, so it
    * recounts without array_distinct.
    */
  def repetitionRatio(text: Column, n: Int): Column =
    element_at(
      transform(array(tokens(text)), toks => {
        val total = greatest(size(toks) - lit(n - 1), lit(0))
        val grams = when(size(toks) < n, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(1), size(toks) - lit(n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n)))))
        when(total === 0, lit(0.0)).otherwise(
          round(lit(1.0) - size(array_distinct(grams)).cast("double")
            / total.cast("double"), 6))
      }),
      1)

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS algorithm, public literature): hash every
    * word `k`-gram, slide a window of `w` consecutive hashes, keep each
    * window's minimum, return the distinct selected hashes sorted.
    * Guarantee: two documents sharing a token run of length >= w+k-1
    * share at least one fingerprint — a local, position-robust
    * alternative to whole-document [[fingerprint]].
    *
    * The k-gram hash is the first 8 hex chars of md5 as a long: every
    * engine computes identical md5 hex, so the DuckDB oracle replicates
    * the selection EXACTLY (full value gate, not rows-only). Fewer than
    * w hashes → one clipped window (the global min); < k tokens → empty.
    * We emit distinct hash VALUES, so winnowing's rightmost-min
    * tie-break cannot affect the result.
    */
  def winnowUdf(k: Int, w: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      val t = if (text == null) "" else text.trim
      val toks: Array[String] = if (t.isEmpty) Array.empty else t.split("\\s+")
      val m = toks.length - k + 1
      if (m <= 0) Seq.empty[Long]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hs = new Array[Long](m)
        var i = 0
        while (i < m) {
          val sb = new StringBuilder(toks(i))
          var j = 1
          while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
          val d = md.digest(sb.toString.getBytes("UTF-8"))
          hs(i) = java.lang.Integer.toUnsignedLong(
            ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) | ((d(2) & 0xff) << 8) | (d(3) & 0xff))
          md.reset()
          i += 1
        }
        val sel = scala.collection.mutable.SortedSet.empty[Long]
        val lastStart = math.max(m - w, 0)
        var s = 0
        while (s <= lastStart) {
          var min = hs(s)
          var j = s + 1
          val end = math.min(s + w, m)
          while (j < end) { if (hs(j) < min) min = hs(j); j += 1 }
          sel += min
          s += 1
        }
        sel.toSeq
      }
    }

  /** Tracking query parameters stripped by [[canonicalUrl]] — the
    * public-knowledge analytics/click-id families every crawl
    * canonicalizer drops (they vary per visit, so keeping them makes
    * one page look like thousands of distinct URLs).
    */
  val TrackingParamPattern: String = "^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)="

  /** URL canonicalization — the first step of crawl-frontier dedup and
    * per-domain accounting (a 100 TB web corpus sees the same page as
    * `HTTP://WWW.Site.com:80/a/?utm_source=x` and `https://site.com/a`;
    * without canonicalization, domain caps and URL-level dedup
    * undercount by whatever the tracking-parameter fan-out is).
    *
    * Steps, all RE2-safe regexp/array Column ops (codegen-visible, no
    * UDF, replays verbatim in the DuckDB oracle):
    *   1. drop the fragment;
    *   2. strip the scheme (case-insensitive) — http/https collapse;
    *   3. lowercase the host, strip a leading `www.`, strip default
    *      ports `:80`/`:443` (other ports are kept — they address
    *      different servers);
    *   4. drop trailing slashes from the path;
    *   5. remove tracking parameters ([[TrackingParamPattern]]) and
    *      empties, then SORT the survivors — parameter order is
    *      transport-irrelevant, so `?a=1&b=2` ≡ `?b=2&a=1`.
    *
    * Returns `host[:port]path[?sorted-params]`.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val noScheme = regexp_replace(noFrag, "^[Hh][Tt][Tt][Pp][Ss]?://", "")
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(noScheme, "^([^/?]+)", 1)),
        "^www\\.", ""),
      ":(80|443)$", "")
    val rest = regexp_replace(noScheme, "^[^/?]*", "")
    val path = regexp_replace(regexp_replace(rest, "\\?.*$", ""), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => length(p) > 0 && !p.rlike(TrackingParamPattern)))
    val qstr = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    concat(host, path, qstr)
  }

  /** Host (domain) of a [[canonicalUrl]]-canonicalized URL — the
    * per-domain aggregation key (domain caps, per-site quality stats,
    * crawl politeness budgets).
    */
  def urlHost(canon: Column): Column = regexp_extract(canon, "^([^/?]+)", 1)

  /** Blocked fuzzy join — record linkage for metadata curation
    * (matching near-miss titles/author/source strings across
    * catalogs): candidate pairs share a lowercased `blockLen`-char
    * prefix (the classic blocking key — an equi-join, so the
    * candidate set is block-sized, never |A|·|B|), then exact
    * Levenshtein distance keeps pairs within `maxDist`. Both engines
    * implement the same unit-cost DP, so the distance — and therefore
    * the match set — replays exactly.
    *
    * One blocking pass only, deliberately: production linkage runs
    * several passes with different keys (prefix, suffix, phonetic) and
    * unions the candidates; each pass is this operator. A typo INSIDE
    * the blocking prefix escapes this pass by construction.
    *
    * @return a ⋈ b columns + `dist`
    */
  def fuzzyJoinBlocked(a: DataFrame, b: DataFrame, nameA: String,
                       nameB: String, blockLen: Int, maxDist: Int): DataFrame = {
    require(blockLen >= 1 && maxDist >= 0)
    a.join(b, substring(lower(col(nameA)), 1, blockLen) ===
        substring(lower(col(nameB)), 1, blockLen))
      .withColumn("dist", levenshtein(col(nameA), col(nameB)))
      .filter(col("dist") <= maxDist)
  }

  /** Sorted-neighborhood record linkage (Hernández & Stolfo 1995 —
    * the OTHER classic blocking strategy, complementing
    * [[fuzzyJoinBlocked]]'s prefix keys): sort the whole catalog by
    * the match key, compare each record only against the `window`
    * records after it in sort order, keep pairs within Levenshtein
    * `maxDist`. Catches near-misses that SORT adjacently even when
    * their prefixes differ (e.g. a leading-article variant) — a
    * production linker runs both passes and unions the candidates.
    *
    * Distributed shape: ONE skew-safe [[graft.core.SkewOps.globalRank]]
    * (range partition + broadcast offsets, no SinglePartition window),
    * then a self-equi-join on the rank BUCKET (bucket = rank div
    * window; a pair within `window` positions spans at most two
    * adjacent buckets, so joining b with {b, b+1} covers every
    * candidate exactly once via the 0 < Δrank ≤ window filter).
    *
    * @return (id_a, id_b, name_a, name_b, dist)
    */
  def fuzzyJoinSorted(recs: DataFrame, idCol: String, nameCol: String,
                      window: Int, maxDist: Int): DataFrame = {
    require(window >= 1 && maxDist >= 0)
    val ranked = graft.core.SkewOps.globalRank(
        recs.select(col(idCol).as("__id"), col(nameCol).as("__name")),
        Seq(col("__name"), col("__id")))
      .withColumn("__bkt", expr(s"(rank - 1) div $window"))
      .localCheckpoint(eager = false) // both sides of the self-join
    // an OR of two bucket equalities would plan as a nested-loop join;
    // instead the right side EXPLODES to its own and its previous
    // bucket as probe keys — one hash equi-join
    val right = ranked.select(col("__id").as("id_b"),
        col("__name").as("name_b"), col("rank").as("__rb"),
        explode(array(col("__bkt"), col("__bkt") - 1)).as("__k"))
    ranked.select(col("__id").as("id_a"), col("__name").as("name_a"),
        col("rank").as("__ra"), col("__bkt"))
      .join(right, col("__bkt") === col("__k"))
      .filter(col("__rb") > col("__ra") && col("__rb") - col("__ra") <= window)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }

  /** Deflate compression ratio of the UTF-8 text — the classic
    * repetitive-junk detector (boilerplate and keyword-stuffed spam
    * compress far better than natural prose; quality pipelines filter
    * on it alongside the Gopher rules). Fixed level + strategy make
    * the byte count deterministic per JVM family, and the ratio is a
    * per-row map with no shuffle — but zlib has no cross-engine SQL
    * twin, so this is the repo's one deliberately rows-only gate
    * (driver checks rows/schema; values are pinned by ScalaTest
    * ordering properties instead).
    *
    * ratio = compressed_bytes / max(1, raw_bytes), rounded to 6 —
    * LOWER means MORE repetitive.
    */
  def compressionRatio: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (text: String) =>
      if (text == null) None
      else {
        val raw = text.getBytes("UTF-8")
        val d = new java.util.zip.Deflater(6, false)
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](raw.length + 64)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        d.end()
        Some(BigDecimal(n.toDouble / math.max(1, raw.length))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }

  /** Cut positions for [[contentChunks]], compiled: 1-based character
    * positions i in [8, numChars−1] where the md5-derived hash of the
    * 8-char window ending at i ≡ 0 (mod `divisor`). Replaces a
    * `filter(sequence(8, L−1), i => pmod(conv(substring(md5(substr)…`
    * higher-order ladder that evaluated an INTERPRETED Catalyst md5 +
    * hex-conv expression tree per character position (the documented
    * interpreted-HOF trap — cf. [[winnowUdf]], the established
    * compiled-loop precedent with the identical first-4-md5-bytes hash).
    * Same hash, same windows, same cuts: `conv(substring(md5(x),1,8),
    * 16,10)` IS the first 4 digest bytes as an unsigned 32-bit value,
    * and Spark's substr counts CODE POINTS, which the offset table
    * below reproduces (a supplementary character is one position, as
    * in UTF8String).
    */
  private def contentCutsUdf(divisor: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      // code-point start offsets into the UTF-8 bytes: off(c) = byte
      // index where character c (0-based) begins; off(n) = total bytes
      val bytes = text.getBytes("UTF-8")
      val nChars = text.codePointCount(0, text.length)
      val off = new Array[Int](nChars + 1)
      // single pass: walk UTF-16 units, accumulate UTF-8 byte length
      var c = 0; var j = 0; var b = 0
      while (j < text.length) {
        off(c) = b
        val cp = text.codePointAt(j)
        b += (if (cp < 0x80) 1 else if (cp < 0x800) 2
              else if (cp < 0x10000) 3 else 4)
        j += Character.charCount(cp)
        c += 1
      }
      off(nChars) = b
      val md = java.security.MessageDigest.getInstance("MD5")
      val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 8 // 1-based position of the window's LAST char; max nChars-1
      while (i <= nChars - 1) {
        md.reset()
        md.update(bytes, off(i - 8), off(i) - off(i - 8))
        val d = md.digest()
        val h = java.lang.Integer.toUnsignedLong(
          ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
            ((d(2) & 0xff) << 8) | (d(3) & 0xff))
        if (h % divisor == 0L) cuts += i
        i += 1
      }
      cuts.toSeq
    }

  /** Content-defined chunking — the CDC primitive under dedup storage
    * (the Rabin/FastCDC family, public literature): a chunk boundary
    * falls AFTER character i whenever the hash of the 8-char window
    * ending at i ≡ 0 (mod `divisor`), so boundaries move WITH the
    * content: an insertion early in a document shifts only the chunk
    * it lands in and every later chunk keeps its fingerprint —
    * chunk-level dedup (groupBy fp) then collapses all unshifted
    * spans across near-identical documents, which fixed-offset
    * chunking cannot do. Expected chunk length ≈ `divisor` chars.
    *
    * Entirely ROW-LOCAL (no shuffle, no sequential state: no min/max
    * clamping, which would couple each cut to the previous one);
    * md5-derived window hashes replay in any engine, so the full
    * chunk table carries a value oracle.
    *
    * @return (idCol, chunk_idx, start, chunk_len, fp) — `start`
    *         1-based, fp = md5 of the chunk text
    */
  def contentChunks(df: DataFrame, idCol: String, textCol: String,
                    divisor: Int = 64): DataFrame = {
    val L = length(col("__text"))
    df.filter(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .select(col(idCol), col(textCol).as("__text"))
      .withColumn("__cuts",
        when(L >= 9, contentCutsUdf(divisor)(col("__text")))
          .otherwise(array().cast("array<int>")))
      .withColumn("__starts",
        concat(array(lit(1)), transform(col("__cuts"), i => i + 1)))
      .withColumn("__ends", concat(col("__cuts"), array(L)))
      .select(col(idCol), col("__text"),
        posexplode(arrays_zip(col("__starts").as("s"), col("__ends").as("e")))
          .as(Seq("chunk_idx", "p")))
      .select(col(idCol), col("chunk_idx"),
        col("p.s").cast("long").as("start"),
        (col("p.e") - col("p.s") + 1).cast("long").as("chunk_len"),
        md5(col("__text").substr(col("p.s"),
          col("p.e") - col("p.s") + lit(1))).as("fp"))
  }

  /** ROUGE-1/2 n-gram-overlap counts between a candidate and a
    * reference text, ROW-LOCAL: both texts sit in the same row, so
    * the clipped-count arithmetic (Lin 2004's modified n-gram
    * overlap: Σ_g min(count_cand(g), count_ref(g))) runs in one
    * compiled pass with ZERO shuffle — the scan-speed shape
    * eval-contamination and summarization-quality screens need at
    * corpus scale (an explode-and-join formulation would shuffle
    * every n-gram). Tokens are lowercase whitespace words (ROOT
    * locale — engine-portable on the ASCII corpora this gates).
    * Returns (o1, c1, r1, o2, c2, r2): overlap / candidate-gram /
    * reference-gram counts for n = 1, 2.
    */
  val rougeCountsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (cand: String, ref: String) =>
      def toks(s: String): Array[String] = {
        val t = if (s == null) ""
          else s.trim.toLowerCase(java.util.Locale.ROOT)
        if (t.isEmpty) Array.empty[String] else t.split("\\s+")
      }
      def grams(a: Array[String], n: Int): java.util.HashMap[String, Int] = {
        val m = new java.util.HashMap[String, Int]()
        var i = 0
        while (i + n <= a.length) {
          val sb = new StringBuilder(a(i))
          var j = 1
          while (j < n) { sb.append(' ').append(a(i + j)); j += 1 }
          m.merge(sb.toString, 1, Integer.sum)
          i += 1
        }
        m
      }
      def clipped(c: java.util.HashMap[String, Int],
                  r: java.util.HashMap[String, Int]): Long = {
        var o = 0L
        val it = c.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          o += math.min(e.getValue, r.getOrDefault(e.getKey, 0))
        }
        o
      }
      val (ca, ra) = (toks(cand), toks(ref))
      def total(a: Array[String], n: Int): Long =
        math.max(0, a.length - n + 1).toLong
      val (c1, r1) = (grams(ca, 1), grams(ra, 1))
      val (c2, r2) = (grams(ca, 2), grams(ra, 2))
      (clipped(c1, r1), total(ca, 1), total(ra, 1),
        clipped(c2, r2), total(ca, 2), total(ra, 2))
    }

  /** ROUGE-1 precision/recall/F1 and ROUGE-2 F1 per row, Round6-exact
    * (F1 = 2PR/(P+R) reduces to 2o/(c+r) — ONE integer division, no
    * ratio-of-ratios); zero-gram sides score 0.0 by definition.
    */
  def rougeScores(df: DataFrame, candCol: String,
                  refCol: String): DataFrame = {
    import graft.core.Round6
    def ratio(num: Column, den: Column): Column =
      when(den === 0, lit(0.0)).otherwise(Round6.intRatio6(num, den))
    df.withColumn("__rc", rougeCountsUdf(col(candCol), col(refCol)))
      .withColumn("rouge1_p", ratio(col("__rc._1"), col("__rc._2")))
      .withColumn("rouge1_r", ratio(col("__rc._1"), col("__rc._3")))
      .withColumn("rouge1_f1",
        ratio(col("__rc._1") * 2, col("__rc._2") + col("__rc._3")))
      .withColumn("rouge2_f1",
        ratio(col("__rc._4") * 2, col("__rc._5") + col("__rc._6")))
      .drop("__rc")
  }
}
