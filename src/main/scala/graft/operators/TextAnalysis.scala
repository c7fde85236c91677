package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, fingerprinting. All pure
  * Catalyst expressions (codegen-friendly, no UDFs), each formula chosen
  * to be re-expressible in ANSI SQL for the DuckDB oracle.
  */
object TextAnalysis {

  /** THE analyzer — the one tokenization contract every lexical
    * operator in the library shares: split on a SINGLE literal space,
    * empty tokens kept (so a run of spaces contributes empty-string
    * tokens to the length, exactly like DuckDB's `string_split(text,
    * ' ')`, which is what keeps the oracles engine-exact). Used by the
    * corpus-scan [[bm25TopK]], [[tokenCountWs]], [[tfidfTopTerms]], and
    * every [[InvertedIndex]] build/append/probe path — so a term that
    * scores through the corpus scan scores identically through the
    * index, and query-side terms must be exact tokens under THIS
    * contract (pre-normalize case/punctuation upstream if the corpus
    * was). */
  def tokens(text: Column): Column = split(text, " ")

  /** [[tokens]] for a driver-side query string — the analyzer a caller
    * MUST use to turn raw query text into the term lists the BM25 /
    * phrase probes take, or index-time and query-time tokenization
    * silently disagree (zero recall, no error). `split(" ", -1)`
    * matches the Column form exactly: single literal space, empty
    * tokens kept (Scala's 1-arg `split` drops trailing empties, which
    * would NOT match).
    *
    * CONSEQUENCE for probe callers: every probe path flatMaps its
    * query terms through this (under `ws` as well as `fold`), so a
    * space-containing "term" SPLITS into its words and each word
    * matches independently — it does not silently match nothing, and
    * it is NOT a phrase (use [[InvertedIndex.phraseTopK]] /
    * `mustPhrases` for consecutive-match semantics). An indexed token
    * can never contain a space, so no recall is lost by splitting. */
  def tokensOf(text: String): Seq[String] = text.split(" ", -1).toSeq

  /** Case/punctuation-folding normalizer — the opt-in `fold` analyzer's
    * text pass: lowercase, every non-alphanumeric RUN collapsed to one
    * space, trimmed. Composes UPSTREAM of the single-space split, so
    * the one tokenization contract ([[tokens]]) is unchanged — and the
    * whole pipeline stays engine-exact because the DuckDB twin is
    * `trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))`
    * (the pattern is in the Java∩RE2 common subset, like [[EmailRe]]).
    * This is what closes the bare analyzer's silent-zero-recall trap:
    * a user querying `spark` misses every doc that says `Spark` unless
    * both sides fold. */
  def foldText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Driver-side [[foldText]] twin (Locale.ROOT — engine-stable). */
  def foldOf(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]+", " ").trim

  /** [[tokens]] under a NAMED analyzer: `ws` (the bare split — the
    * default, pinned contract) or `fold` ([[foldText]] first). The
    * analyzer is recorded in a persisted index's sidecar
    * ([[InvertedIndex.build]]) so index-time and query-time
    * tokenization can never silently disagree. */
  def tokens(text: Column, analyzer: String): Column = analyzer match {
    case "ws" => tokens(text)
    case "fold" => split(foldText(text), " ")
    case other =>
      throw new IllegalArgumentException(s"unknown analyzer '$other' (ws|fold)")
  }

  /** [[tokensOf]] under a named analyzer — the query-side twin of
    * `tokens(text, analyzer)`. NOTE: under `fold`, one raw query term
    * may fold into SEVERAL tokens ("Data-Base" -> data, base), so
    * query-side folding flatMaps through this. */
  def tokensOf(text: String, analyzer: String): Seq[String] = analyzer match {
    case "ws" => tokensOf(text)
    case "fold" => foldOf(text).split(" ", -1).toSeq
    case other =>
      throw new IllegalArgumentException(s"unknown analyzer '$other' (ws|fold)")
  }

  /** Fold an array-of-terms COLUMN under the `fold` analyzer — the
    * batch twin of the flatMap in [[tokensOf]], for data-sized query
    * frames (each element folds and may split; order preserved). */
  def foldTermsArray(arr: Column): Column =
    flatten(transform(arr, t => split(foldText(t), " ")))

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text)).cast(LongType)

  /** BPE-ish token count: runs of letters, runs of digits, and individual
    * other non-space characters each count as one token. */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).cast(LongType)

  /** Rolling-hash style document fingerprint (md5 of lowercased text —
    * hex string, identical across engines). */
  def fingerprint(text: Column): Column = md5(lower(text))

  // ------------------------------------------------------- PII scrubbing
  /** Redaction patterns — deliberately in the Java∩RE2 common subset so
    * the exact same strings run in Spark (java.util.regex) and the
    * DuckDB oracle (RE2): no backrefs, no lookaround, `[^ ]` instead of
    * `\S`. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val LongNumRe = "[0-9]{6,}"

  /** PII/pattern scrub for training corpora: URLs, then emails, then
    * long digit runs (account-number shaped) are replaced with typed
    * placeholder tokens — URL first so an address inside a URL is
    * counted once. Pure `regexp_replace` chain: codegen'd, partition-
    * parallel, no UDFs. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "[URL]"),
        EmailRe, "[EMAIL]"),
      LongNumRe, "[ID]")

  /** Per-document scrub stats: match counts per pattern class (on the
    * original text) plus the redacted text. */
  def redactColumns(text: Column): Seq[(String, Column)] = Seq(
    "n_urls" -> size(regexp_extract_all(text, lit(UrlRe), lit(0))).cast(LongType),
    "n_emails" -> size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast(LongType),
    "n_longnums" -> size(regexp_extract_all(text, lit(LongNumRe), lit(0))).cast(LongType),
    "redacted" -> redact(text))

  // ------------------------------------------- HTML main-text extraction
  /** HTML extraction patterns — like the redaction set, deliberately in
    * the Java∩RE2 common subset (inline `(?is)` flags, lazy `.*?`, no
    * backrefs/lookaround) so the EXACT same strings run in Spark
    * (java.util.regex) and the DuckDB oracle (RE2). */
  val HtmlScriptRe = "(?is)<script[^>]*>.*?</script>"
  val HtmlStyleRe = "(?is)<style[^>]*>.*?</style>"
  val HtmlCommentRe = "(?s)<!--.*?-->"
  val HtmlTagRe = "(?s)<[^>]*>"
  val WsRunRe = "[ \\t\\r\\n]+"

  /** Boilerplate-stripping MAIN-TEXT extraction for web-crawl corpora —
    * the step between "HTML arrived" and every text-quality gate:
    * script/style blocks drop WITH their content (their text is never
    * prose), comments drop, every remaining tag becomes a space (so
    * `<p>a</p><p>b</p>` keeps a word boundary), the common named
    * entities decode (`&amp;` LAST, so `&amp;lt;` yields the literal
    * `&lt;` — single-decode, never double), and whitespace runs fold to
    * one space. Pure codegen'd `regexp_replace`/`replace` chain:
    * partition-parallel, no UDF, no allocation beyond the result.
    *
    * Deliberate bounds (documented, not bugs): an UNCLOSED script/style
    * block keeps its text (the lazy match needs the closing tag; the
    * tag strip still removes the markup), and numeric character
    * references beyond the named set pass through untouched — a
    * full HTML5 entity table is a dictionary lookup, not a filter
    * pipeline's job. */
  def extractHtmlText(html: Column): Column = {
    val noMarkup =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(html, HtmlScriptRe, " "),
            HtmlStyleRe, " "),
          HtmlCommentRe, " "),
        HtmlTagRe, " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
      "&amp;" -> "&" // last: single-decode
    ).foldLeft(noMarkup) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, WsRunRe, " "))
  }

  // ------------------------------------------------------------ chunking
  /** Split a document into fixed-size token chunks with overlap — the
    * context-window packing prep step of a training pipeline. Chunk i
    * covers tokens [i·(size-overlap), i·(size-overlap)+size); the last
    * chunk may be short; a document of ≤ size tokens is one chunk.
    * Returns an array of chunk strings (posexplode for one row per
    * chunk). Pure expressions: the fan-out happens AFTER any
    * partition-parallel filter/projection, and chunks of one document
    * stay in its partition — no shuffle. */
  def tokenChunks(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val toks = split(text, " ")
    val n = size(toks)
    // nChunks = 1 + ceil(max(n - chunkSize, 0) / stride)
    val nChunks = lit(1) + ceil(
      greatest(n - chunkSize, lit(0)).cast(DoubleType) / stride).cast(IntegerType)
    transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * stride + 1, lit(chunkSize)), " "))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken local fingerprints
    * for near-dup detection): hash every character k-gram, slide a window
    * of `w` hashes, keep each window's minimum, return the distinct
    * minima sorted. Two documents share fingerprints iff they share
    * k-gram runs — robust to insertions/reorders where the whole-doc
    * [[fingerprint]] is not.
    *
    * Hash = first 48 bits of md5(gram) so the exact pipeline is
    * re-expressible in the DuckDB oracle (value-identical HOF
    * formulation: `array_sort(array_distinct(transform(seq(0,n-w),
    * j -> array_min(slice(hashes, j+1, w)))))` over
    * `hashes = transform(grams, g -> conv(md5(g)[1:12],16,10))`).
    * Implemented as a one-pass monotonic-deque Expression
    * ([[graft.functions.WinnowFingerprints]]): O(len) per row where the
    * HOF slice-min walks O(len * w) interpreted lambda frames. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 16): Column =
    graft.functions.PortableHashes.winnowFingerprints(text, k, w)

  private val StopWords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** Unrounded composite quality score — use this for FILTERING so
    * boundary decisions agree with an oracle computing the raw formula
    * (the rounded `quality` output column can cross a threshold its raw
    * value does not). */
  def qualityScoreRaw(text: Column): Column = {
    val toks = split(text, " ")
    val nWords = size(toks).cast(DoubleType)
    val nChars = length(text).cast(DoubleType)
    val nPunct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast(DoubleType)
    val nStop = size(filter(toks, t => t.isin(StopWords: _*))).cast(DoubleType)
    least(nWords / 20.0, lit(1.0)) * 0.4 +
      least(nStop / nWords * 5.0, lit(1.0)) * 0.3 +
      (lit(1.0) - least(nPunct / nChars * 10.0, lit(1.0))) * 0.3
  }

  /** Quality-scoring columns: length, word stats, punctuation ratio,
    * stopword ratio, and a composite 0..1 quality score. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = split(text, " ")
    val nWords = size(toks).cast(DoubleType)
    val nChars = length(text).cast(DoubleType)
    val nLetters = length(regexp_replace(text, "[^a-zA-Z]", "")).cast(DoubleType)
    val nPunct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast(DoubleType)
    val nStop = size(filter(toks, t => t.isin(StopWords: _*))).cast(DoubleType)
    val avgWordLen = length(regexp_replace(text, " ", "")).cast(DoubleType) / nWords
    val stopRatio = nStop / nWords
    val punctRatio = nPunct / nChars
    // Composite heuristic: long-enough docs with a plausible stopword rate
    // and low punctuation score high.
    val score =
      least(nWords / 20.0, lit(1.0)) * 0.4 +
        least(stopRatio * 5.0, lit(1.0)) * 0.3 +
        (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.3
    Seq(
      "n_words" -> size(toks).cast(LongType),
      "avg_word_len" -> round(avgWordLen, 6),
      "letter_ratio" -> round(nLetters / nChars, 6),
      "punct_ratio" -> round(punctRatio, 6),
      "stopword_ratio" -> round(stopRatio, 6),
      "quality" -> round(score, 6))
  }

  /** Marker-word languages: (lang, markers). Occurrence counts of each
    * marker substring vote for the language. */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " is ", " and "),
    "de" -> Seq(" der ", " und ", " nicht "),
    "es" -> Seq(" el ", " que ", " los "),
    "fr" -> Seq(" le ", " les ", " est "),
    "zh" -> Seq("的", "是", "了"))

  /** Occurrence count of a literal substring. */
  private def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) / marker.length).cast(LongType)

  /** Per-language marker votes plus an argmax `lang_pred` column
    * (deterministic tie-break: declaration order, 'und' when no votes). */
  def langIdColumns(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), text, lit(" "))
    val scores = LangMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => occurrences(padded, m)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // chained WHEN gives earlier languages precedence on ties
    val predFirst = scores.foldLeft(Option.empty[Column]) { case (acc, (lang, s)) =>
      Some(acc match {
        case None => when(s === best && s > 0, lang)
        case Some(c) => c.when(s === best && s > 0, lang)
      })
    }.get.otherwise("und")
    scores.map { case (l, s) => s"score_$l" -> s } :+ ("lang_pred" -> predFirst)
  }

  /** Corpus language-model quality score: average log-probability of a
    * document's character bigrams under the corpus's own bigram
    * distribution — the KenLM-shaped "does this look like the corpus"
    * filter, self-trained so there is no external model file. Two
    * passes: one groupBy builds the (broadcastable) frequency table, one
    * join + groupBy scores documents. Log values are quantized to 1e-4
    * before summing so the per-doc total is order-independent and
    * engine-exact. */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // per-doc bigram COUNTS computed inside the row (one-pass
    // expression) and materialized once: the occurrence fan-out (text
    // length rows per doc) never hits a shuffle, and the model build,
    // normalizer, and scoring join all reuse this frame
    val docBg = df.select(col(idCol).as("id"),
        explode(graft.functions.PortableHashes.charBigramCounts(col(textCol)))
          .as(Seq("bg", "k")))
      .localCheckpoint(true)
    val freq = docBg.groupBy(col("bg")).agg(sum(col("k")).as("c"))
    val total = freq.agg(sum(col("c")).as("t"))
    docBg.join(broadcast(freq), "bg")
      .crossJoin(broadcast(total))
      // lp is quantized per distinct bigram, then weighted by its count —
      // identical to summing the quantized value per occurrence
      .withColumn("lp",
        round(log(col("c").cast(DoubleType) / col("t").cast(DoubleType)) * 10000)
          .cast(LongType) * col("k"))
      .groupBy(col("id"))
      .agg(sum(col("k")).as("n_bigrams"),
        round(sum(col("lp")).cast(DoubleType) / 10000.0 / sum(col("k")), 6).as("avg_logp"))
  }

  /** Top-k tokens per document by tf-idf.
    *
    * explode -> tf groupBy -> df groupBy -> joins -> windowed top-k.
    * The corpus-size scalar is broadcast; the document-frequency table
    * is NOT hinted — it is vocabulary-sized (hundreds of millions of
    * terms on a web corpus), so the tf↔df join must stay a plain
    * shuffle join and let Catalyst/AQE pick broadcast only when the
    * measured size allows. The data-sized shuffles are the two token
    * groupBys and that join. Deterministic: score rounded post-ordering
    * with (score desc, token) tiebreak.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.distinct().groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = df.select(countDistinct(col(idCol)).as("n"))
    val w = Window.partitionBy(col("id")).orderBy(col("score").desc, col("tok"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast(DoubleType) * log(col("n").cast(DoubleType) / col("df").cast(DoubleType)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("id"), col("rnk").cast(IntegerType).as("rnk"), col("tok"),
        round(col("score"), 6).as("score"))
  }

  /** More-like-this SEED extraction: one (qid, terms) query row per
    * requested document — its top-`nTerms` TF-IDF terms in rank order —
    * ready to feed [[InvertedIndex.bm25TopKBatch]] (typically with
    * `allowed` = corpus minus the seed docs, so the seed can't outrank
    * its own neighbors). The classic Lucene MoreLikeThis decomposition:
    * term selection by TF-IDF, retrieval by BM25 — and all of it stays
    * a DataFrame (the seed terms never funnel through the driver, any
    * number of seed docs batch in one pass).
    *
    * Scale shape: the seed semi-join gates the corpus BEFORE any
    * explode, aggregate, or window — the tf groupBy and the per-seed
    * rank window run over seed-sized frames only. (The earlier shape
    * computed corpus-wide per-doc TF-IDF and semi-joined LAST; verified
    * against the optimizer: the semi-join does NOT push below the
    * window, so one seed paid the whole corpus's window rank.) Document
    * frequency stays CORPUS-WIDE — term rarity means nothing measured
    * seed-locally — but only the seed VOCABULARY's postings shuffle:
    * the corpus token stream semi-joins the seed vocab before the
    * distinct, and the df side carries no broadcast hint (a web
    * corpus's vocabulary is far beyond broadcast size; gated, AQE may
    * still choose one). The one corpus-wide cost left is that token
    * scan itself — [[mltQueriesIdx]] removes it by taking df from the
    * persisted index. */
  def mltQueries(df: DataFrame, idCol: String, textCol: String,
      seedIds: DataFrame, nTerms: Int): DataFrame = {
    require(nTerms >= 1, s"nTerms must be >= 1, got $nTerms")
    val tf = seedTermFreqs(df, idCol, textCol, seedIds, "ws")
    val corpusToks = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
    val dfreq = corpusToks
      .join(tf.select(col("tok")).distinct(), Seq("tok"), "left_semi")
      .distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = df.select(countDistinct(col(idCol)).as("n"))
    val scored = tf.join(dfreq, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast(DoubleType) * log(col("n").cast(DoubleType) / col("df").cast(DoubleType)))
    rankedTerms(scored, nTerms)
  }

  /** [[mltQueries]] with document frequency taken from a persisted
    * [[InvertedIndex]] instead of a corpus token scan — the serving
    * shape: per call, the corpus pays only the seed semi-join scan
    * (tokenization and aggregation run over seed rows alone), term
    * rarity comes from the index's bucket-pruned postings
    * ([[InvertedIndex.termDfs]] — reads only the seed vocabulary's
    * term buckets), and N from the index's exact stats sidecar. This is
    * what makes a per-microbatch MLT stream
    * ([[graft.streaming.StreamingOps.mltStream]]) cost ∝ batch. Over an
    * index whose corpus equals `docs` (no tombstones), the selected
    * terms are value-identical to [[mltQueries]]'s; a term absent from
    * the index never ranks (it could not be retrieved anyway). */
  def mltQueriesIdx(spark: SparkSession, indexPath: String, docs: DataFrame,
      idCol: String, textCol: String, seedIds: DataFrame, nTerms: Int): DataFrame = {
    require(nTerms >= 1, s"nTerms must be >= 1, got $nTerms")
    val st = InvertedIndex.readStats(spark, indexPath)
    // ONE seed-gated corpus pass per call, materialized (seed-sized by
    // construction) so the df probe and the scoring plan both reuse it;
    // seeds tokenize through the INDEX's recorded analyzer, so term
    // selection and retrieval can never disagree on token space
    val tf = seedTermFreqs(docs, idCol, textCol, seedIds, st.analyzer)
      .localCheckpoint(true)
    mltFromSeedTf(spark, indexPath, st.nDocs, tf, nTerms)
  }

  /** [[mltQueriesIdx]] with the seed TEXT from the index's own doc
    * store ([[InvertedIndex.fetchDocs]] — requires an index built with
    * `storeText = true`) — the fully corpus-scan-free serving shape:
    * the seed fetch reads only the seeds' dbucket directories, term
    * rarity comes from the bucket-pruned postings, N from the stats
    * sidecar. Nothing in the call touches the corpus at all, so a
    * 5-seed MLT call costs the same against 500k docs or 100 TB. Seed
    * ids absent from the index (or tombstoned) contribute no query
    * row, exactly as a semi-join against the corpus would drop them. */
  def mltQueriesIdx(spark: SparkSession, indexPath: String,
      seedIds: DataFrame, nTerms: Int): DataFrame = {
    require(nTerms >= 1, s"nTerms must be >= 1, got $nTerms")
    val st = InvertedIndex.readStats(spark, indexPath)
    val tf = InvertedIndex.fetchDocs(spark, indexPath, seedIds)
      .select(col("id").as("qid"),
        explode(tokens(col("text"), st.analyzer)).as("tok"))
      .groupBy(col("qid"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    mltFromSeedTf(spark, indexPath, st.nDocs, tf, nTerms)
  }

  /** Shared tail of the index-backed MLT variants: score the seed
    * (qid, tok, tf) frame with index df + sidecar N, rank to terms. */
  private def mltFromSeedTf(spark: SparkSession, indexPath: String,
      nDocs: Long, tf: DataFrame, nTerms: Int): DataFrame = {
    val dfreq = InvertedIndex.termDfs(spark, indexPath,
      tf.select(col("tok")).distinct(), "tok")
      .withColumnRenamed("term", "tok")
    val scored = tf.join(dfreq, Seq("tok"))
      .withColumn("score",
        col("tf").cast(DoubleType) * log(lit(nDocs.toDouble) / col("df").cast(DoubleType)))
    rankedTerms(scored, nTerms)
  }

  /** Seed-gated (qid, tok, tf): semi-join the corpus to the seed ids
    * FIRST, then tokenize — nothing corpus-sized explodes or shuffles. */
  private def seedTermFreqs(df: DataFrame, idCol: String, textCol: String,
      seedIds: DataFrame, analyzer: String): DataFrame = {
    val seeds = seedIds.select(col(seedIds.columns.head).cast(StringType).as("qid"))
    df.select(col(idCol).cast(StringType).as("qid"), col(textCol).as("__text__"))
      .join(seeds, Seq("qid"), "left_semi")
      .select(col("qid"), explode(tokens(col("__text__"), analyzer)).as("tok"))
      .groupBy(col("qid"), col("tok")).agg(count(lit(1)).as("tf"))
  }

  /** Top-`nTerms` per qid by (score desc, tok) — the same rank contract
    * as [[tfidfTopTerms]] (score compared UNROUNDED) — collapsed to one
    * (qid, terms) row in rank order. */
  private def rankedTerms(scored: DataFrame, nTerms: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("tok"))
    scored
      .withColumn("rnk", row_number().over(w).cast(IntegerType))
      .filter(col("rnk") <= nTerms)
      .groupBy(col("qid"))
      .agg(transform(sort_array(collect_list(struct(col("rnk"), col("tok")))),
        e => e("tok")).as("terms"))
  }

  // --------------------------------------------------- BM25 retrieval
  /** Okapi BM25 top-k keyword retrieval — the lexical half of hybrid
    * (keyword + vector) search. Scores every document against a literal
    * term list with the standard Robertson/Lucene formula
    * `Σ_t idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl))`,
    * `idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1)`, and returns the
    * k best (score > 0, ties by id).
    *
    * Scale shape: TWO corpus scans and no data-sized shuffle. Pass 1 is
    * one aggregate emitting a single (|terms|+2)-scalar row — N, avgdl,
    * and df per query term via `array_contains` folds (map-side
    * combinable) — which is collected and re-planted as plan literals.
    * Pass 2 computes each doc's score with in-row `filter()` HOF term
    * counts (codegen, no explode — the token fan-out never leaves its
    * source row) and reduces through TakeOrderedAndProject, so the
    * shuffle carries O(partitions × k) rows regardless of corpus size.
    * Scores are rounded to 6 dp BEFORE the ordering so the ranking is
    * reproducible across engines (the DuckDB oracle orders the same
    * rounded value with the same id tiebreak).
    *
    * `allowed` is the O4 metadata predicate lowered to a one-column id
    * frame: a left-semi join gates candidate docs before pass 2's
    * scoring, while pass 1's corpus stats (N, avgdl, df) stay
    * CORPUS-WIDE — Lucene filter-context semantics, identical to
    * [[InvertedIndex.bm25TopK]]'s `allowed`, so filtered scores match
    * unfiltered ones doc for doc. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      allowed: Option[DataFrame] = None,
      analyzer: String = "ws"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"need k1 >= 0 and 0 <= b <= 1")
    // query terms pass through the SAME analyzer as the corpus (under
    // `fold` a raw term may split into several tokens)
    val terms = queryTerms.flatMap(tokensOf(_, analyzer)).distinct
    val toks = tokens(col(textCol), analyzer)
    val base = df.select(col(idCol).as("id"), toks.as("__toks__"),
      size(toks).cast(DoubleType).as("__dl__"))
    // pass 1: corpus stats — one tiny row, collected, re-planted as literals
    val statAggs =
      Seq(count(lit(1)).cast(DoubleType).as("n"), avg(col("__dl__")).as("avgdl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("__toks__"), t), 1d).otherwise(0d)).as(s"df_$i")
        }
    val stats = base.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val n = stats.getDouble(0)
    // an empty corpus has no avgdl (null under the hood) — return the
    // explicit empty frame instead of NaN-poisoned scores, the same
    // guard as the indexed probe
    if (n == 0d) {
      return df.select(col(idCol).as("id"), lit(0d).as("bm25")).limit(0)
    }
    val avgdl = stats.getDouble(1)
    // pass 2: per-doc score from in-row term counts against the
    // literals, over the allow-gated candidates (stats stay corpus-wide)
    val gated = allowed match {
      case Some(a) => base.join(
        a.select(col(a.columns.head).cast(base.schema("id").dataType).as("id")),
        Seq("id"), "left_semi")
      case None => base
    }
    val score = terms.zipWithIndex.map { case (t, i) =>
      val dfT = stats.getDouble(2 + i)
      val idf = math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
      val tf = size(filter(col("__toks__"), x => x === lit(t))).cast(DoubleType)
      lit(idf) * tf / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl__") / lit(avgdl)))
    }.reduce(_ + _)
    gated.select(col("id"), round(score, 6).as("bm25"))
      .filter(col("bm25") > 0d)
      .orderBy(col("bm25").desc, col("id"))
      .limit(k)
  }

  /** BM25F multi-FIELD top-k over the corpus scan — the Lucene
    * title-boosted-over-body shape, simple BM25F (Robertson/Zaragoza):
    * `score(d) = Σ_t idf(t) · tf̃ / (k1 + tf̃)` with
    * `tf̃(t,d) = Σ_f boost_f · tf(t,f,d) / (1 − b_f + b_f·dl_f/avgdl_f)`
    * and DOC-level idf (df counts a doc once if the term appears in
    * ANY field). Same two-pass scale shape as [[bm25TopK]]: pass 1 is
    * one aggregate row (N, per-field avgdl, per-term any-field df)
    * re-planted as literals; pass 2 is in-row HOF term counts per
    * field reduced through TakeOrderedAndProject — no data-sized
    * shuffle. Determinism matches the index twin
    * ([[InvertedIndex.bm25fTopK]]): per-field contributions quantize
    * to 1e-9 longs before the cross-field sum, per-term scores before
    * the per-doc sum — both sums exact integer arithmetic, so the two
    * forms agree score-for-score over the same corpus. `fields` =
    * (textCol, boost, b) in a FIXED caller-chosen order. Emits
    * (id, bm25f). */
  def bm25fTopK(df: DataFrame, idCol: String,
      fields: Seq[(String, Double, Double)], queryTerms: Seq[String],
      k: Int, k1: Double = 1.2, analyzer: String = "ws"): DataFrame = {
    require(fields.nonEmpty, "need at least one (textCol, boost, b) field")
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 >= 0, s"k1 must be >= 0, got $k1")
    fields.foreach { case (_, _, bf) =>
      require(bf >= 0 && bf <= 1, s"need 0 <= b <= 1 per field, got $bf") }
    val terms = queryTerms.flatMap(tokensOf(_, analyzer)).distinct
    val base = df.select(col(idCol).as("id") +:
      fields.zipWithIndex.flatMap { case ((c, _, _), i) =>
        val t = tokens(col(c), analyzer)
        Seq(t.as(s"__toks${i}__"), size(t).cast(DoubleType).as(s"__dl${i}__"))
      }: _*)
    // pass 1: one tiny stats row — N, per-field avgdl, any-field df
    val statAggs =
      Seq(count(lit(1)).cast(DoubleType).as("n")) ++
        fields.indices.map(i => avg(col(s"__dl${i}__")).as(s"avgdl$i")) ++
        terms.zipWithIndex.map { case (t, j) =>
          sum(when(fields.indices
              .map(i => array_contains(col(s"__toks${i}__"), t)).reduce(_ || _),
            1d).otherwise(0d)).as(s"df_$j")
        }
    val stats = base.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val n = stats.getDouble(0)
    if (n == 0d) {
      return df.select(col(idCol).as("id"), lit(0d).as("bm25f")).limit(0)
    }
    val avgdls = fields.indices.map(i => stats.getDouble(1 + i))
    // pass 2: in-row per-field tf against the literals, quantized sums
    val score = terms.zipWithIndex.map { case (t, j) =>
      val dfT = stats.getDouble(1 + fields.size + j)
      val idf = math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
      val wtfQ = fields.zipWithIndex.map { case ((_, boost, bf), i) =>
        val tf = size(filter(col(s"__toks${i}__"), x => x === lit(t))).cast(DoubleType)
        round(lit(boost) * tf /
          (lit(1.0 - bf) + lit(bf) * col(s"__dl${i}__") / lit(avgdls(i))) * 1e9)
          .cast(LongType)
      }.reduce(_ + _)
      val wtf = wtfQ.cast(DoubleType) / 1e9
      round(lit(idf) * wtf / (lit(k1) + wtf) * 1e9).cast(LongType)
    }.reduce(_ + _)
    base.select(col("id"), round(score.cast(DoubleType) / 1e9, 6).as("bm25f"))
      .filter(col("bm25f") > 0d)
      .orderBy(col("bm25f").desc, col("id"))
      .limit(k)
  }

  // --------------------------------------------------- sequence packing
  /** Concat-and-chunk sequence packing: documents are concatenated in
    * (`groupCol`, ascending `idCol`) order and cut into fixed
    * `budgetTokens`-token training sequences (the GPT-style packing
    * step); a document may span several sequences. Emits the per-doc
    * placement: which sequence the doc starts in, at what token offset,
    * and how many sequences it spans — the index a pipeline needs to
    * write packed examples or build attention-reset masks.
    *
    * Packing is per GROUP (source, shard, ...), not global: a global
    * running sum would serialize on one partition, while per-group
    * windows pack every group in parallel — the 100 TB shape (groups =
    * shards sized to taste). All closed-form window arithmetic: one
    * shuffle on the group key, no iteration.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol), col(idCol),
        tokenCountWs(col(textCol)).as("n_tokens"))
      .withColumn("__cum__", sum(col("n_tokens")).over(w))
      .select(col(groupCol), col(idCol), col("n_tokens"),
        ((col("__cum__") - col("n_tokens")) / budgetTokens).cast(LongType).as("seq_id"),
        ((col("__cum__") - col("n_tokens")) % budgetTokens).as("seq_offset"),
        (((col("__cum__") - 1) / budgetTokens).cast(LongType) -
          ((col("__cum__") - col("n_tokens")) / budgetTokens).cast(LongType) + 1L)
          .as("n_seqs_spanned"))
  }

  // ----------------------------------------------- benchmark decontamination
  /** Benchmark-contamination stats: for every training document, the
    * fraction of its distinct word n-gram shingles that also appear in an
    * evaluation/benchmark corpus (the standard n-gram-overlap
    * decontamination check run before LLM training; real pipelines use
    * n=8..13 — the fixture corpus's tiny vocabulary needs n=3 for a
    * non-degenerate signal).
    *
    * Scale shape: the eval side (benchmarks) is tiny relative to a
    * 100 TB corpus, so its distinct-gram set is BROADCAST; the corpus
    * side never shuffles its text — the exploded (id, gram) rows join
    * map-side against the broadcast and reduce to per-doc counts with a
    * map-side-combinable groupBy on id. One data-sized shuffle of small
    * (id, partial-count) rows total.
    *
    * Output: (id, n_grams, n_hits, contam_frac, contaminated). Documents
    * shorter than n words shingle to the whole text (see
    * [[Dedup.wordShingles]]) so they still participate.
    */
  def contaminationStats(
      docs: DataFrame, evalDocs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.05): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
      .distinct()
      .withColumn("__hit__", lit(1L))
    docs.select(col(idCol).as("id"),
        explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit__"), lit(0L))).as("n_hits"))
      .withColumn("contam_frac",
        round(col("n_hits").cast(DoubleType) / col("n_grams"), 6))
      .withColumn("contaminated",
        col("n_hits").cast(DoubleType) / col("n_grams") >= threshold)
  }

  /** Two-phase Bloom-filter decontamination — the variant for eval
    * SUITES whose distinct-gram set is too large to broadcast as an
    * exact table (the assumption [[contaminationStats]] rests on).
    *
    * Phase 1 folds the eval grams into one Bloom filter (Spark's native
    * `BloomFilterAggregate` over xxhash64 — a few MB regardless of gram
    * count) and gates every corpus gram through `might_contain`: a
    * Bloom filter has NO false negatives, so a doc whose grams all miss
    * is EXACTLY clean (n_hits = 0) and never shuffles anywhere. Phase 2
    * re-checks only the flagged minority's grams against the exact gram
    * table with a plain equi join — at fpp≈1% the shuffle carries a few
    * percent of the corpus grams instead of all of them, and the eval
    * table itself joins distributed (no broadcast needed). Output is
    * EXACTLY [[contaminationStats]] — the filter only routes work.
    *
    * @param fpp target false-positive rate for the phase-1 filter
    *            (drives the optimal bit count for the measured distinct
    *            gram count). */
  def contaminationStatsBloom(
      docs: DataFrame, evalDocs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.05, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val evalGrams = evalDocs
      .select(explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
      .distinct()
    // size the filter from the measured gram count (one cheap count over
    // the eval split): optimal bits = -n ln(p) / (ln 2)^2
    val nItems = math.max(1L, evalGrams.count())
    val numBits = math.max(64L,
      math.ceil(-nItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloomAgg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(col("gram")))),
      org.apache.spark.sql.catalyst.expressions.Literal(nItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression()
    // the aggregated filter binary collects to the driver and rides as a
    // plan CONSTANT (might_contain requires one; this is what
    // df.stat.bloomFilter does too) — O(numBits/8) bytes regardless of
    // gram count, the whole point of the structure
    val bfBytes = evalGrams.agg(ColumnBridge.column(bloomAgg).as("__bf__"))
      .head().getAs[Array[Byte]]("__bf__")
    val grams = docs
      .select(col(idCol).as("id"), explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
    def mightContain(v: Column): Column = ColumnBridge.column(
      new BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal.create(bfBytes, BinaryType),
        new XxHash64(Seq(ColumnBridge.expression(v)))))
    // phase 1: per-doc gram count + bloom-maybe count, no data shuffle of
    // gram text — the filter is a literal in the row-local predicate
    val phase1 = grams
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(mightContain(col("gram")), 1L).otherwise(0L))
          .as("__n_maybe__"))
    // phase 2: exact verify for the flagged minority only (no false
    // negatives -> unflagged docs are exactly clean)
    val flagged = phase1.filter(col("__n_maybe__") > 0L).select(col("id"))
    val exactHits = grams
      .join(flagged, Seq("id"), "left_semi")
      .join(evalGrams.withColumn("__hit__", lit(1L)), Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(sum(coalesce(col("__hit__"), lit(0L))).as("n_hits"))
    phase1
      .join(exactHits, Seq("id"), "left_outer")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contam_frac",
        round(col("n_hits").cast(DoubleType) / col("n_grams"), 6))
      .withColumn("contaminated",
        col("n_hits").cast(DoubleType) / col("n_grams") >= threshold)
  }

  /** Stateless per-row contamination gate: the eval-set's distinct grams
    * ride along as ONE plan literal (collected once — eval sets are
    * small by nature) and each row's overlap is an in-row
    * `array_intersect`. No join, no groupBy, no state — which is what
    * makes the same column work unchanged over `readStream` (the
    * streaming ingest gate) where [[contaminationStats]]'s
    * explode+groupBy would need stateful aggregation. */
  def contaminationGateColumns(text: Column, evalGrams: Seq[String],
      n: Int = 3, threshold: Double = 0.05): Seq[(String, Column)] = {
    val ev = typedlit(evalGrams)
    val grams = Dedup.wordShingles(text, n)
    val nGrams = size(grams).cast(LongType)
    val nHits = size(array_intersect(grams, ev)).cast(LongType)
    Seq(
      "n_grams" -> nGrams,
      "n_hits" -> nHits,
      "contam_frac" -> round(nHits.cast(DoubleType) / nGrams, 6),
      "contaminated" -> (nHits.cast(DoubleType) / nGrams >= threshold))
  }

  // ------------------------------------------------- repetition (Gopher)
  /** Gopher-style repetition-quality columns (Rae et al. 2021 §A1.1:
    * high duplicate-word / top-n-gram fractions indicate boilerplate or
    * generated spam). All pure expressions evaluated inside the row —
    * no explode, no shuffle:
    *
    *  - `dup_word_frac`: 1 − distinct words / words
    *  - `dup_bigram_frac`: 1 − distinct word-bigrams / bigrams
    *  - `top_bigram_frac`: occurrences of the most frequent bigram /
    *    total bigrams, computed as the longest equal-run of the SORTED
    *    bigram array — one linear `aggregate` pass, no O(n²) pairwise
    *    counting
    *  - `repetition_pass`: the composite keep/drop flag
    *
    * A document with fewer than 2 words has no bigrams: its bigram
    * fractions are 0.0 (nothing repeated) and it passes.
    */
  def repetitionColumns(
      text: Column,
      maxDupWordFrac: Double = 0.55,
      maxTopBigramFrac: Double = 0.07): Seq[(String, Column)] = {
    val toks = split(text, " ")
    val nWords = size(toks).cast(DoubleType)
    val dupWordFrac = lit(1.0) - size(array_distinct(toks)).cast(DoubleType) / nWords
    val bigrams = transform(
      sequence(lit(0), greatest(size(toks) - 2, lit(0))),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))
    val nBigrams = (size(toks) - 1).cast(DoubleType)
    val dupBigramFrac = when(size(toks) < lit(2), lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(bigrams)).cast(DoubleType) / nBigrams)
    // longest equal-run of the sorted bigram list = max occurrence count
    // of any bigram; struct-state fold is one interpreted pass per row
    // (docs are row-local and short — the fan-out never shuffles)
    val maxRun = aggregate(
      array_sort(bigrams),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val topBigramFrac = when(size(toks) < lit(2), lit(0.0))
      .otherwise(maxRun.cast(DoubleType) / nBigrams)
    Seq(
      "dup_word_frac" -> round(dupWordFrac, 6),
      "dup_bigram_frac" -> round(dupBigramFrac, 6),
      "top_bigram_frac" -> round(topBigramFrac, 6),
      "repetition_pass" ->
        (dupWordFrac < maxDupWordFrac && topBigramFrac < maxTopBigramFrac))
  }

  /** Full per-document text-analysis projection. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val cols = qualityColumns(col(textCol)) ++ langIdColumns(col(textCol)) ++ Seq(
      "tokens_ws" -> tokenCountWs(col(textCol)),
      "tokens_re" -> tokenCountRegex(col(textCol)),
      "fingerprint" -> fingerprint(col(textCol)))
    cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
  }
}
