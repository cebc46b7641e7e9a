package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language id, quality
  * scoring, token counting, document fingerprinting. All pure builtin
  * Column expressions (whole-stage codegen, no UDFs), with formulas chosen
  * to be transcribable to SQL for the oracle gate.
  */
object TextAnalysis {

  /** Occurrences of `needle` in `hay` via length arithmetic (portable). */
  def countOccurrences(hay: Column, needle: String): Column =
    (length(hay) - length(regexp_replace(hay, java.util.regex.Pattern.quote(needle), ""))) / needle.length

  private def padded(text: Column): Column =
    concat(lit(" "), Dedup.normalizedText(text), lit(" "))

  /** Tiny per-language stopword marker sets (top function words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " a ", " and ", " of ", " to "),
    "de" -> Seq(" der ", " die ", " und ", " das ", " ein "),
    "es" -> Seq(" el ", " la ", " los ", " y ", " de "),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " un "),
    "zh" -> Seq(" 的 ", " 是 ", " 了 ", " 在 ", " 和 "))

  /** Stopword-hit count for one language. */
  def stopwordScore(text: Column, lang: String): Column =
    stopwords(lang).map(w => countOccurrences(padded(text), w))
      .reduce(_ + _).cast("long")

  /** n-gram/stopword-heuristic language id: argmax score, alphabetical
    * tie-break (deterministic). */
  def langIdCol(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    // greatest(struct) compares fields in order: score first, then the
    // negated alphabetical rank so ties go to the alphabetically-first lang
    val ranked = langs.zipWithIndex.map { case (l, i) =>
      struct(stopwordScore(text, l).as("s"), lit(-i).as("nr"), lit(l).as("l"))
    }
    greatest(ranked: _*).getField("l")
  }

  /** Whitespace token count (portable split semantics). */
  def tokenCount(text: Column): Column =
    size(split(Dedup.normalizedText(text), " ")).cast("long")

  /** BPE-ish subword-unit count: runs of letters, digits, or single other
    * non-space chars (regexp_count, mirrored by DuckDB regexp_extract_all). */
  def bpeishCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long")

  /** Quality metrics: integer-valued components of the classic
    * length/punct/stopword heuristics, plus a boolean keep flag. */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val norm = Dedup.normalizedText(t)
    df.withColumn("n_chars_norm", length(norm).cast("long"))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_punct",
        regexp_count(t, lit("[.,;:!?]")).cast("long"))
      .withColumn("n_stopwords_en", stopwordScore(t, "en"))
      .withColumn("mean_token_len_e2",
        // ×100 fixed-point mean token length; explicit FLOOR so the SQL
        // mirror truncates identically (DuckDB casts round, Spark's truncate)
        floor((length(norm) - (tokenCount(t) - 1)).cast("double") * 100.0
          / tokenCount(t).cast("double")).cast("long"))
      .withColumn("quality_keep",
        (col("n_tokens") >= 10 && col("n_chars_norm") >= 50 &&
          col("n_punct") * 5 <= col("n_tokens")).cast("boolean"))
  }

  /** Corpus vocabulary: global token occurrence + document-frequency
    * counts, top-k by occurrences (ties lexicographic) — the
    * vocabulary-building pass of a tokenizer pipeline. One explode + one
    * hash aggregation (map-side partial), top-k as a single ordered limit
    * (TakeOrderedAndProject — no global sort materialization). */
  def vocabulary(df: DataFrame, textCol: String, idCol: String,
                 topK: Int = 100): DataFrame = {
    val toks = Dedup.fanOut(df).select(col(idCol),
        explode(split(Dedup.normalizedText(coalesce(col(textCol), lit(""))), " "))
          .as("token"))
      .where(col("token") =!= "")
    toks.groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(topK)
  }

  /** Per-group character n-gram document-frequency profile: the top-k
    * n-grams by number of documents containing them (ties broken
    * lexicographically) — the statistical signature classic language-ID
    * models compare against. One explode + hash-aggregation + ranking
    * window per group. */
  def ngramProfile(df: DataFrame, textCol: String, groupCol: String,
                   n: Int = 2, topK: Int = 10): DataFrame = {
    val grams = Dedup.fanOut(df)
      .select(col(groupCol), Dedup.normalizedText(col(textCol)).as("__norm"))
      .select(col(groupCol),
        explode(Dedup.shinglesOfNormalized(col("__norm"), n)).as("ngram"))
    val counts = grams.groupBy(col(groupCol), col("ngram"))
      .agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("freq").desc, col("ngram").asc)
    counts.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
  }

  /** Repetition metrics (the Gopher-style within-document duplication
    * filters): duplicate-token mass and most-frequent-2-gram dominance,
    * emitted as exact integers so thresholds — and the oracle — stay
    * engine-portable. `n_tokens - n_distinct_tokens` over `n_tokens` is
    * the duplicate-word fraction; `max_2gram_count` over `n_2grams` is the
    * top-2-gram fraction. One explode + two hash-aggregations. */
  def repetitionMetrics(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // null text behaves as empty (1 empty token) — without the coalesce,
    // Spark's legacy size(null) = -1 poisons the fractions downstream
    val toks = split(Dedup.normalizedText(coalesce(col(textCol), lit(""))), " ")
    val base = df.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      toks.as("__toks"))
    val grams = Dedup.fanOut(base)
      .where(col("n_tokens") >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), col("n_tokens").cast("int") - 1),
        i => concat(element_at(col("__toks"), i), lit(" "),
          element_at(col("__toks"), i + 1)))).as("__g"))
    val gramStats = grams.groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(max(col("__c")).as("max_2gram_count"),
        sum(col("__c")).as("n_2grams"))
    base.drop("__toks")
      .join(gramStats, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_distinct_tokens"),
        coalesce(col("max_2gram_count"), lit(0L)).as("max_2gram_count"),
        coalesce(col("n_2grams"), lit(0L)).as("n_2grams"))
  }

  /** PII patterns chosen for cross-engine regex parity (simple classes
    * only — behave identically under Java regex and RE2): emails and long
    * digit runs (phone/account shaped). */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val LongNumberPattern = "[0-9]{9,}"

  /** PII detection + redaction: per-document match counts and the
    * redacted text (emails → <EMAIL>, long digit runs → <NUM>), all as
    * codegen'd builtins. Redaction runs on the normalized lowercase text
    * so the patterns and their SQL mirrors agree byte-for-byte. */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val norm = Dedup.normalizedText(col(textCol))
    df.withColumn("n_emails", regexp_count(norm, lit(EmailPattern)).cast("long"))
      .withColumn("n_long_numbers",
        regexp_count(norm, lit(LongNumberPattern)).cast("long"))
      .withColumn("redacted_text",
        regexp_replace(regexp_replace(norm, EmailPattern, "<EMAIL>"),
          LongNumberPattern, "<NUM>"))
  }

  /** Content fingerprint: md5 of normalized text (exact identity) plus the
    * smallest shingle hash (a 1-element winnowing sketch; min-k extends it). */
  def fingerprint(df: DataFrame, textCol: String, shingleK: Int = 8): DataFrame =
    df.withColumn("__fpnorm", Dedup.normalizedText(col(textCol)))
      .withColumn("fp_md5", md5(col("__fpnorm")))
      .withColumn("fp_min_shingle",
        array_min(transform(Dedup.shinglesOfNormalized(col("__fpnorm"), shingleK),
          s => md5(s))))
      .drop("__fpnorm")

  /** Distinct word n-grams of the normalized text: consecutive
    * whitespace-token windows re-joined with single spaces. Documents
    * shorter than n tokens yield an empty array (no n-grams). In-row
    * higher-order functions — no explode until the caller wants one. */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsOfTokens(split(Dedup.normalizedText(text), " "), n)

  /** [[wordNgrams]] over an already-split token-array column — pass a
    * staged attribute so the split/normalization runs once per row, not
    * once per n-gram (the lambda references it per element; see
    * [[graft.operators.Dedup.shinglesOfNormalized]]). */
  def wordNgramsOfTokens(toks: Column, n: Int): Column = {
    require(n >= 1, "n-gram size must be >= 1")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
  }

  /** Benchmark decontamination: for every corpus document, the number of
    * distinct word `n`-grams it shares with ANY benchmark document, plus a
    * contaminated flag — the test-set-overlap scrub every training-data
    * pipeline runs before releasing a corpus.
    *
    * Scale shape: the benchmark n-gram set is tiny relative to the corpus
    * (benchmarks are thousands of docs, corpora are billions), so it is
    * aggregated once and BROADCAST; the corpus side is one explode + one
    * broadcast hash semi-join + one hash aggregation — the corpus is never
    * shuffled on n-gram. n-grams are distinct per document, so the count
    * is "distinct contaminated n-grams" without a countDistinct. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, textCol: String,
                    idCol: String, n: Int = 5): DataFrame = {
    def toksOf(c: Column) = split(Dedup.normalizedText(c), " ")
    val benchGrams = benchmark
      .select(toksOf(col(textCol)).as("__toks"))
      .select(explode(wordNgramsOfTokens(col("__toks"), n)).as("__gram"))
      .distinct()
    val corpusGrams = Dedup.fanOut(corpus)
      .select(col(idCol), toksOf(col(textCol)).as("__toks"))
      .select(col(idCol), explode(wordNgramsOfTokens(col("__toks"), n)).as("__gram"))
    val hits = corpusGrams.join(broadcast(benchGrams), Seq("__gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__hits"), lit(0L)).as("n_contaminated_ngrams"),
        (coalesce(col("__hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bloom-prescreened decontamination: [[contamination]]'s exact result
    * at a fraction of its join traffic. Stage 1 builds a Bloom filter of
    * the benchmark's distinct n-gram hashes (benchmark-side only — one
    * small job) and broadcasts it; stage 2 scans the corpus and keeps
    * only Bloom-POSITIVE (doc, gram) rows — a codegen'd primitive-long
    * probe per gram ([[graft.functions.BloomMightContainLong]]); stage 3
    * runs the exact broadcast semi-join on the survivors only, which
    * removes Bloom false positives. No false negatives exist, so the
    * output is bit-identical to [[contamination]] — the gate shares its
    * oracle.
    *
    * Why this matters at 100 TB: the exact join probes a broadcast hash
    * relation with every corpus gram (~|tokens| rows); the Bloom pass
    * reduces the join input to the contaminated sliver (typically ≪1%)
    * for ~12 MB of broadcast bits at fpp=1% on a 10⁷-gram benchmark —
    * the first-pass filter every production scrub (e.g. the
    * Dolma/DataComp decontamination recipes) runs before exact overlap
    * accounting. */
  def contaminationBloom(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String, n: Int = 5,
                         fpp: Double = 0.01): DataFrame = {
    def toksOf(c: Column) = split(Dedup.normalizedText(c), " ")
    // materialized once: the gram frame feeds three consumers (sizing
    // count, Bloom build, exact verify join) and would otherwise
    // re-tokenize the benchmark for each
    val benchGrams = benchmark
      .select(toksOf(col(textCol)).as("__toks"))
      .select(explode(wordNgramsOfTokens(col("__toks"), n)).as("__gram"))
      .distinct()
      .localCheckpoint(true)
    val benchHashes = benchGrams.select(xxhash64(col("__gram")).as("__h"))
    // benchmark-side sizing job (bounded by the eval suite, not the
    // corpus); the filter itself is built by one tree-aggregated job
    val nGrams = math.max(benchHashes.count(), 1L)
    val bloom = benchHashes.stat.bloomFilter("__h", nGrams, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val corpusGrams = Dedup.fanOut(corpus)
      .select(col(idCol), toksOf(col(textCol)).as("__toks"))
      .select(col(idCol), explode(wordNgramsOfTokens(col("__toks"), n)).as("__gram"))
      .where(graft.functions.BloomMightContainLong.column(
        xxhash64(col("__gram")), bc))
    val hits = corpusGrams.join(broadcast(benchGrams), Seq("__gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__hits"), lit(0L)).as("n_contaminated_ngrams"),
        (coalesce(col("__hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Min-k winnowing fingerprint: the k smallest md5 hashes of the
    * document's distinct shingles, ascending — the MOSS-style sketch that
    * generalizes [[fingerprint]]'s 1-element min. Two documents' Jaccard
    * similarity is estimable from sketch overlap alone, so pairwise
    * near-dup verification can run on k hashes instead of full texts.
    * In-row (sort of ≤ |shingles| values per row, no shuffle); documents
    * with fewer than k shingles keep them all. */
  def winnowFingerprint(df: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 8, k: Int = 8): DataFrame = {
    require(k >= 1, "sketch size k must be >= 1")
    // fanOut: the per-row work (|shingles| md5s + a sort) dwarfs the row
    // width, so a single-split input must spread before the projection
    Dedup.fanOut(df)
      .select(col(idCol), Dedup.normalizedText(col(textCol)).as("__norm"))
      .select(col(idCol),
        slice(array_sort(transform(
          Dedup.shinglesOfNormalized(col("__norm"), shingleK),
          s => md5(s))), 1, k).as("fp_hashes"))
  }

  /** Sketch-based pairwise Jaccard estimation over [[winnowFingerprint]]
    * min-k sketches: for each candidate pair, X = the k smallest hashes of
    * the UNION of the two sketches (exactly the k smallest of A∪B, since
    * each sketch covers its side's k minima), and |X ∩ S(A) ∩ S(B)| / |X|
    * is an unbiased estimate of J(A, B) — near-dup verification from 2·k
    * hashes per pair instead of full shingle sets (q34's exact counts need
    * the texts; this needs only the sketch table). Emits exact integers
    * (n_sketch, n_overlap); the ratio is the caller's. */
  def sketchJaccardCounts(sketches: DataFrame, pairs: DataFrame,
                          idCol: String, k: Int): DataFrame = {
    require(k >= 1, "sketch size k must be >= 1")
    val aSide = sketches.select(col(idCol).as("a"), col("fp_hashes").as("__fa"))
    val bSide = sketches.select(col(idCol).as("b"), col("fp_hashes").as("__fb"))
    pairs.join(aSide, Seq("a")).join(bSide, Seq("b"))
      .select(col("a"), col("b"), col("__fa"), col("__fb"),
        slice(array_sort(array_union(col("__fa"), col("__fb"))), 1, k).as("__x"))
      .select(col("a"), col("b"),
        size(col("__x")).cast("long").as("n_sketch"),
        size(array_intersect(array_intersect(col("__x"), col("__fa")), col("__fb")))
          .cast("long").as("n_overlap"))
  }

  /** TF-IDF top terms per document: token frequencies joined with corpus
    * document frequencies, scored tf · (N - df + 0.5)/(df + 0.5) (the
    * rational IDF of [[bm25]] — engine-portable, rank-equivalent to the
    * log form), top-k per document by score then token. One explode + two
    * hash aggregations + one join on token + one per-doc ranking window —
    * every stage shuffles on a natural high-cardinality key. */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    topK: Int = 3): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val toks = Dedup.fanOut(df).select(col(idCol),
        explode(split(Dedup.normalizedText(coalesce(col(textCol), lit(""))), " "))
          .as("token"))
      .where(col("token") =!= "")
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df")) // tf rows are distinct (doc, token)
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfT, Seq("token")).crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          ((col("__n").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"),
        col("tfidf"))
  }

  /** Feature hashing (the "hashing trick"): each document becomes a
    * sparse `dim`-bucket signed count vector — token t adds ±1 (md5
    * parity) to bucket md5("fh:" + t) mod dim per occurrence. The signed
    * variant keeps collisions unbiased in expectation (Weinberger et al.
    * 2009); values are exact integers under the engine-portable md5
    * convention of [[graft.operators.Sampling.hashBucket]], so results
    * hash-match any engine. This is the vocabulary-free text→vector step
    * (no fitted dictionary to broadcast or drift) that feeds
    * [[graft.operators.Similarity.randomProjection]], k-means, or a
    * linear classifier at corpus scale: one explode and ONE hash
    * aggregation on (id, bucket) with map-side combine — no joins, no
    * corpus-wide state, nothing to retrain as data grows. Output: one
    * row per (id, j) with a nonzero-or-cancelled signed count. */
  def hashedFeatures(df: DataFrame, textCol: String, idCol: String,
                     dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val toks = Dedup.fanOut(df).select(col(idCol),
        explode(split(Dedup.normalizedText(coalesce(col(textCol), lit(""))), " "))
          .as("token"))
      .where(col("token") =!= "")
    // ONE md5-prefix convention, owned by Sampling.hashBucket — bucket
    // and sign are both instances of it (distinct prefixes decorrelate)
    val bucket = Sampling.hashBucket(concat(lit("fh:"), col("token")), dim)
    val sign = when(
      Sampling.hashBucket(concat(lit("sg:"), col("token")), 2) === 0,
      lit(1L)).otherwise(lit(-1L))
    toks.select(col(idCol), bucket.as("j"), sign.as("__s"))
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("__s")).as("val"))
  }

  /** Sliding-window document chunking: split each document into token
    * windows of `window` tokens advancing by `stride` (overlapping when
    * stride < window) — the context-window preparation step between a raw
    * corpus and a trainable dataset. Emits one row per chunk:
    * (id, chunk_id, chunk_text, n_chunk_tokens). Chunk starts are
    * 0, stride, 2·stride, …; the final window is truncated at the
    * document end, and a document shorter than one window yields exactly
    * one chunk. In-row higher-order functions feed one explode — no
    * shuffle at all; the operator is embarrassingly row-parallel. */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be >= 1")
    val toks = split(Dedup.normalizedText(coalesce(col(textCol), lit(""))), " ")
    val n = size(toks)
    // ceil(max(n - window, 0) / stride) + 1 windows
    val nChunks = (ceil(greatest(n - window, lit(0)).cast("double") / stride)
      .cast("int") + 1)
    Dedup.fanOut(df)
      .select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol), col("__toks"),
        posexplode(transform(sequence(lit(0), col("__nc") - 1),
          i => array_join(slice(col("__toks"), i * stride + 1, lit(window)), " ")))
          .as(Seq("chunk_id", "chunk_text")))
      // arithmetic, not a re-split of chunk_text; also keeps __toks
      // multi-referenced so its split stays staged (one eval per row)
      .withColumn("n_chunk_tokens",
        least(lit(window), size(col("__toks")) - col("chunk_id") * stride)
          .cast("long"))
      .drop("__toks")
  }

  /** BM25 relevance score of every document against a fixed bag of query
    * terms. Classic Robertson formula with one deliberate substitution:
    * IDF is the RATIONAL form (N - df + 0.5) / (df + 0.5) with no log —
    * ln() is not IEEE-defined and differs across math libraries, while
    * +,-,*,/ are correctly rounded everywhere, so the rational variant is
    * reproducible bit-for-bit across engines (the log is monotone in the
    * rational, so RANKINGS are identical; only the score scale differs).
    * k1/b default to dyadic rationals (1.25, 0.75) so every constant is an
    * exact double.
    *
    * Scale shape: term frequencies are in-row array filters (no explode —
    * the term list is fixed and small); corpus stats (N, avgdl, per-term
    * df) are ONE tiny aggregate row broadcast back over the corpus; no
    * shuffle of the corpus at all. */
  def bm25(df: DataFrame, textCol: String, idCol: String, terms: Seq[String],
           k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = split(Dedup.normalizedText(coalesce(col(textCol), lit(""))), " ")
    val tfCols = terms.indices.map(i =>
      size(filter(col("__toks"), x => x === lit(terms(i)))).cast("long").as(s"__tf$i"))
    val base = df.select(col(idCol), toks.as("__toks"),
        size(toks).cast("long").as("__dl"))
      .select(col(idCol) +: col("__dl") +: tfCols: _*)
    val statAggs = Seq(sum(col("__dl")).as("__sumdl"), count(lit(1)).as("__n")) ++
      terms.indices.map(i => sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val joined = base.crossJoin(broadcast(stats))
    val nD = col("__n").cast("double")
    val avgdl = col("__sumdl").cast("double") / nD
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val dfT = col(s"__df$i").cast("double")
      val idf = ((nD - dfT) + lit(0.5)) / (dfT + lit(0.5))
      idf * ((tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("__dl").cast("double") / avgdl))))
    }.reduce(_ + _) // fixed left-assoc term order: the SQL mirror adds identically
    joined.select(col(idCol), score.as("bm25"))
  }

  /** All character n-grams of normalized text WITH multiplicity (unlike
    * Dedup.shinglesOfNormalized's distinct set) — language-model counts
    * need every occurrence. Truncated tail grams are dropped. */
  private def gramsWithMultiplicity(norm: Column, n: Int): Column =
    filter(
      transform(sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
        i => norm.substr(i, lit(n))),
      g => length(g) === n)

  /** Character n-gram counts of a corpus: (gram, cnt) — the model side of
    * [[charLmScore]]. One explode + one hash aggregation; the result is
    * bounded by charset^n (a few thousand rows for real text), NOT corpus
    * size, so it broadcasts at any scale. */
  def charLmCounts(df: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    Dedup.fanOut(df)
      .select(Dedup.normalizedText(coalesce(col(textCol), lit(""))).as("__norm"))
      .select(explode(gramsWithMultiplicity(col("__norm"), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
  }

  /** A char-n-gram LM as its two count frames (order n and its n−1
    * contexts) — the ADDITIVE form: two models over disjoint corpora
    * merge by summing per-gram counts, which is what makes the persisted
    * lifecycle ([[graft.sources.TextModelStore.saveCharLm]]) appendable.
    * Both frames are charset-bounded (≤ charset^n rows), never
    * corpus-sized. */
  final case class CharLmCounts(ngrams: DataFrame, contexts: DataFrame,
                                n: Int)

  /** Both count orders of [[charLmScore]]'s model in ONE corpus pass
    * (r21 — previously two independent [[charLmCounts]] scans, each
    * re-normalizing and re-exploding the corpus): order-n and
    * order-(n−1) grams explode together and share one hash aggregation;
    * gram LENGTH is the disambiguator (an n-gram and an (n−1)-gram can
    * never be the same string), so splitting the combined counts by
    * length reproduces the two [[charLmCounts]] frames row-for-row. The
    * combined result is charset-bounded (≤ charset^n + charset^(n−1)
    * rows, never corpus-sized), so the eager checkpoint that lets both
    * returned frames — and any number of downstream actions (the model
    * store writes each order separately) — read it without re-scanning
    * the corpus costs O(model), not O(corpus). */
  def charLmTrain(df: DataFrame, textCol: String, n: Int = 3): CharLmCounts = {
    require(n >= 2, "conditional scoring needs n >= 2")
    val combined = Dedup.fanOut(df)
      .select(Dedup.normalizedText(coalesce(col(textCol), lit(""))).as("__norm"))
      .select(explode(concat(
        gramsWithMultiplicity(col("__norm"), n),
        gramsWithMultiplicity(col("__norm"), n - 1))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    CharLmCounts(
      combined.where(length(col("gram")) === n),
      combined.where(length(col("gram")) === n - 1), n)
  }

  /** Char-n-gram language-model fluency score (the CCNet-style quality
    * signal): per document, the add-one-smoothed conditional log-prob of
    * each n-gram given its (n−1)-char context,
    * ln((cnt_n + 1) / (cnt_ctx + vocabSize)), summed over the document.
    * Returns (id, n_ngrams, logprob_q4) where logprob_q4 is the sum of
    * PER-NGRAM quantized log-probs, floor(10^4 · ln p) — quantizing
    * before the sum keeps the aggregate in exact integer arithmetic, so
    * the result is independent of aggregation order and engine (a raw
    * double sum would be non-associative and unhashable cross-engine).
    * Units: 0.1 milli-nats; avg per-gram log-prob = logprob_q4 / (10^4 ·
    * n_ngrams), perplexity = exp(−avg).
    *
    * Scale shape: both model frames are charset-bounded and broadcast;
    * scoring is map-side (explode + two broadcast joins + row-local
    * arithmetic) and the per-doc reduce is one hash aggregation with
    * map-side combine — the corpus itself never shuffles. Docs shorter
    * than n normalized chars produce no n-grams and are absent from the
    * result (score them as unknown downstream). */
  def charLmScore(df: DataFrame, idCol: String, textCol: String,
                  ngramCounts: DataFrame, contextCounts: DataFrame,
                  n: Int = 3, vocabSize: Int = 128): DataFrame = {
    require(n >= 2, "conditional scoring needs n >= 2")
    require(vocabSize >= 1, "vocabSize must be >= 1")
    val grams = Dedup.fanOut(df)
      .select(col(idCol),
        Dedup.normalizedText(coalesce(col(textCol), lit(""))).as("__norm"))
      .select(col(idCol), explode(gramsWithMultiplicity(col("__norm"), n)).as("gram"))
      .withColumn("ctx", col("gram").substr(1, n - 1))
    val m3 = ngramCounts.select(col("gram").as("__g"), col("cnt").as("__cn"))
    val m2 = contextCounts.select(col("gram").as("__c"), col("cnt").as("__cc"))
    val p = (coalesce(col("__cn"), lit(0L)) + lit(1L)).cast("double") /
      (coalesce(col("__cc"), lit(0L)) + lit(vocabSize.toLong)).cast("double")
    grams
      .join(broadcast(m3), grams("gram") === m3("__g"), "left")
      .join(broadcast(m2), grams("ctx") === m2("__c"), "left")
      .withColumn("__q", floor(lit(1e4) * log(p)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"), sum(col("__q")).as("logprob_q4"))
  }

  /** BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units"): learn `merges`
    * byte-pair merges from the corpus. Returns the merge table —
    * (step, left_tok, right_tok, merged, n) with n the weighted pair
    * frequency at the time of the merge. Deterministic: ties break by
    * (count desc, left asc, right asc); merge application is leftmost
    * non-overlapping string replace on the space-padded symbol
    * encoding — the one deliberate deviation from canonical BPE is that
    * two occurrences of the winning pair in DIRECT token succession
    * (e.g. the run `a a a a` for pair (a,a)) share a separator space, so
    * they merge alternately within one step instead of all at once;
    * every engine's `replace` agrees on this order, which is what makes
    * the algorithm portably exact.
    *
    * Scale shape — the reason BPE training is feasible at corpus scale:
    * only the FIRST aggregation (word → frequency) touches the corpus;
    * every merge iteration then runs on the distinct-word vocabulary
    * frame, which is vocabulary-sized, not corpus-sized. Each iteration
    * is one hash-agg over in-row adjacent pairs plus a 1-row
    * TakeOrdered `collect()` (the winning pair must become a string
    * literal in the next iteration's `replace` — k driver rows total,
    * bounded by `merges`). The vocab frame is localCheckpointed per
    * iteration to truncate the k-deep lineage. */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int): DataFrame =
    bpeTrainBatched(df, textCol, merges, batch = 1)

  /** [[bpeTrain]] with BATCHED merge selection — the distributed-BPE
    * round-collapsing trick: each round ranks pair counts once and
    * greedily accepts up to `batch` pairs whose SYMBOL SETS are pairwise
    * disjoint, then applies them all in one pass. Disjointness is what
    * makes the batch sound: merging ' a b ' can only change counts of
    * pairs sharing a or b (neighbors gain (x,ab)/(ab,y), overlaps lose),
    * so every accepted pair's count — and its ' l r ' match sites — are
    * invariant under the other accepted merges; application order within
    * a round is irrelevant (they apply in rank order regardless).
    *
    * At `batch` = 1 the greedy selection is exactly "take the max".
    * One documented deviation from textbook sequential BPE (found by
    * the r20 DifferentialSpec, which pins the actual contract): merges
    * apply as sequential non-overlapping replace of `' l r '` on the
    * space-joined symbol string, and each match consumes the separator
    * space after `r` — so at a BACK-TO-BACK site ("abab" under (a,b))
    * the second occurrence does not merge in the same step; the site
    * survives to a later round's recount (the pair can be re-learned,
    * and encode-time replay of the table in training order picks the
    * deferred sites up on its fresh scan). Deterministic, train/encode
    * self-consistent, and mirrored verbatim by the q131/q132/q141
    * oracles; repairing it to textbook semantics would need a
    * double-separator representation changed in lockstep across the
    * operator and all three oracle transcriptions. At `batch` = N a
    * 32k-merge tokenizer run schedules ~N× fewer Spark jobs (one
    * count+collect and one checkpoint per ROUND instead of per merge) —
    * the difference between 32k sequential job barriers and 4k at N=8.
    * The table can differ from sequential BPE's (a merge CREATES pairs —
    * (x,ab) may outrank the round's remaining picks), which is the
    * standard, documented trade of batched BPE; `n` records each pair's
    * frequency at its round's start.
    *
    * Greedy selection scans a DETERMINISTIC candidate window of
    * 4·batch + 8 top pairs (by n desc, l asc, r asc) — part of the
    * algorithm's definition (the DuckDB oracle mirrors it), and the
    * driver-collect bound. A round always accepts ≥ 1 pair (rank 1 is
    * never blocked), so capping the window costs acceptance, never
    * correctness: unpicked pairs stay for the next round's recount. */
  def bpeTrainBatched(df: DataFrame, textCol: String, merges: Int,
                      batch: Int): DataFrame = {
    require(merges >= 1, "merges must be >= 1")
    require(batch >= 1, "batch must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val words = Dedup.fanOut(df)
      .select(explode(split(Dedup.normalizedText(coalesce(col(textCol), lit(""))),
        " ")).as("__w"))
      .where(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__freq"))
    // per-word symbol sequence, space-joined, space-padded at both ends
    // so a merge can match ' l r ' on whole tokens only
    val charSeq = concat(lit(" "),
      array_join(transform(sequence(lit(1), length(col("__w"))),
        i => col("__w").substr(i, lit(1))), " "),
      lit(" </w> "))
    var vocab = words.select(col("__w"), col("__freq"), charSeq.as("__seq"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val want = math.min(batch, merges - step + 1)
      val window = 4 * batch + 8
      val toks = split(trim(col("__seq")), " ")
      val cands = vocab
        .select(col("__freq"), toks.as("__t"))
        .where(size(col("__t")) >= 2)
        .select(col("__freq"), explode(transform(
          sequence(lit(1), size(col("__t")) - 1),
          i => struct(element_at(col("__t"), i).as("l"),
            element_at(col("__t"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("__freq")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(window).collect()
      if (cands.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val picked = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        cands.iterator.takeWhile(_ => picked.length < want).foreach { row =>
          val (l, r) = (row.getString(0), row.getString(1))
          if (!used(l) && !used(r)) {
            picked += ((l, r, row.getLong(2)))
            used += l; used += r
          }
        }
        picked.foreach { case (l, r, n) =>
          learned += ((step, l, r, n)); step += 1
        }
        vocab = vocab.withColumn("__seq",
            picked.foldLeft(col("__seq")) { case (acc, (l, r, _)) =>
              replace(acc, lit(s" $l $r "), lit(s" $l$r "))
            })
          .localCheckpoint(true)
      }
    }
    learned.toSeq
      .toDF("step", "left_tok", "right_tok", "n")
      .select(col("step"), col("left_tok"), col("right_tok"),
        concat(col("left_tok"), col("right_tok")).as("merged"), col("n"))
  }

  /** Apply a learned BPE merge table ([[bpeTrain]]'s output) to
    * documents: (id, n_words, n_bpe_tokens) — the sequence-length
    * statistic a token-budgeted pipeline needs from its tokenizer.
    *
    * Scale shape: FULLY row-local. The whole normalized document becomes
    * ONE space-padded symbol string, then the k merges apply as k nested
    * codegen'd `replace`s in training order. No explode, no vocabulary
    * join, nothing shuffles — the merge table itself is the only
    * collected state (k rows, bounded by the merge count).
    *
    * Why this equals per-word application: word boundaries are DOUBLE
    * spaces while merge patterns contain only single spaces, so a match
    * can never consume a neighboring word's padding (each word segment
    * keeps its own leading/trailing space, exactly like the isolated
    * per-word string training used); and a pattern can never straddle
    * the boundary because `</w>`-bearing symbols only occur
    * word-terminally and are therefore never the LEFT of a learned
    * pair. */
  def bpeEncodeCounts(df: DataFrame, idCol: String, textCol: String,
                      mergeTable: DataFrame): DataFrame = {
    val merges = mergeTable.orderBy(col("step"))
      .select(col("left_tok"), col("right_tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val staged = df.select(col(idCol),
      Dedup.normalizedText(coalesce(col(textCol), lit(""))).as("__norm"))
    val chars = filter(transform(
      sequence(lit(1), greatest(length(col("__norm")), lit(1))),
      i => col("__norm").substr(i, lit(1))), c => length(c) === 1)
    // the trailing space inside the "</w> " symbol plus the join space
    // make every word boundary a DOUBLE space — see the scaladoc
    val symbols = transform(chars,
      c => when(c === " ", lit("</w> ")).otherwise(c))
    val seq0 = concat(lit(" "), array_join(symbols, " "), lit(" </w> "))
    val encoded = merges.foldLeft(seq0) { case (acc, (l, r)) =>
      replace(acc, lit(s" $l $r "), lit(s" $l$r "))
    }
    staged.select(col(idCol),
      size(split(col("__norm"), " ")).cast("long").as("n_words"),
      size(filter(split(trim(encoded), " "), t => t =!= ""))
        .cast("long").as("n_bpe_tokens"))
  }

  // ---- DSIR importance resampling + Naive Bayes quality classifier ----

  /** Word tokens (with multiplicity) of normalized text; empty docs give
    * an empty array, never [""]. */
  private[graft] def wordTokens(text: Column): Column =
    filter(split(Dedup.normalizedText(coalesce(text, lit(""))), " "),
      t => t =!= "")

  /** DSIR's hashed bag-of-ngrams feature list: word unigrams ++ bigrams,
    * WITH multiplicity (importance weights are per-occurrence). Bigrams
    * via zip_with against the 1-shifted token list (the null-padded tail
    * pair is filtered). Row-local. */
  private[graft] def wordFeatures(text: Column): Column = {
    val toks = wordTokens(text)
    val bi = filter(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => when(b.isNotNull, concat(a, lit(" "), b))),
      g => g.isNotNull)
    concat(toks, bi)
  }

  /** Feature → hash bucket in [0, buckets): first 48 bits of md5 mod
    * buckets — the same portable construction as
    * [[Sampling.hashBucket]], applied to the feature string itself. */
  private[graft] def featureBucket(f: Column, buckets: Int): Column =
    pmod(conv(substring(md5(f), 1, 12), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** floor(10^4 · ln(num/den)) as a long — the per-term quantization that
    * keeps downstream sums in exact integer arithmetic (see
    * [[charLmScore]] for the rationale). */
  private def qlog(num: Column, den: Column): Column =
    floor(lit(1e4) * log(num.cast("double") / den.cast("double")))
      .cast("long")

  /** DSIR importance weights bundled with the bucket-space size they
    * were estimated over — scoring derives the feature hash modulus from
    * here, so weights and scores can never silently disagree on the
    * bucket space. */
  final case class DsirWeights(weights: DataFrame, buckets: Int)

  /** DSIR bucket weights (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): estimate target and raw
    * distributions over `buckets` hashed n-gram features and return ONE
    * ROW PER BUCKET with the quantized log-importance ratio
    *   wq_q4(b) = floor(1e4·ln((t_b+1)/(T+B))) − floor(1e4·ln((r_b+1)/(R+B)))
    * (add-one smoothing on both sides; T/R = total target/raw feature
    * occurrences). The frame is CLOSED over the bucket space — buckets
    * unseen in either corpus still get their smoothed weight — so scoring
    * can inner-join it without an unknown-feature fallback path.
    *
    * Scale shape: both corpora reduce to B-row count frames via one
    * explode + hash aggregation each (map-side combine; the corpora never
    * shuffle), totals ride along as 1-row broadcast-nested-loop factors,
    * and the result is B rows — broadcastable at any corpus scale. The
    * distributions are counts, so at 100 TB estimate them on a hash
    * sample (`raw.where(Sampling.sampledBy(id, pct))`) — B-bucket
    * frequencies converge long before the full pass, and scoring (the
    * part that must see every row) is unchanged. */
  def dsirBucketWeights(raw: DataFrame, target: DataFrame, textCol: String,
                        buckets: Int = 512): DsirWeights = {
    require(buckets >= 2, "bucket space must have at least 2 buckets")
    def counts(df: DataFrame, as: String) = Dedup.fanOut(df)
      .select(explode(wordFeatures(col(textCol))).as("__f"))
      .select(featureBucket(col("__f"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(as))
    val rb = counts(raw, "__r")
    val tb = counts(target, "__t")
    val totals = rb.agg(coalesce(sum(col("__r")), lit(0L)).as("__rtot"))
      .crossJoin(tb.agg(coalesce(sum(col("__t")), lit(0L)).as("__ttot")))
    val b = lit(buckets.toLong)
    DsirWeights(
      raw.sparkSession.range(buckets).select(col("id").as("bucket"))
        .join(rb, Seq("bucket"), "left")
        .join(tb, Seq("bucket"), "left")
        .crossJoin(totals)
        .select(col("bucket"),
          (qlog(coalesce(col("__t"), lit(0L)) + 1L, col("__ttot") + b) -
           qlog(coalesce(col("__r"), lit(0L)) + 1L, col("__rtot") + b))
            .as("wq_q4")),
      buckets)
  }

  /** Per-document DSIR importance score: the sum of bucket weights over
    * every feature occurrence, plus the occurrence count. Docs with no
    * features (empty text) are absent, as in [[charLmScore]]. Downstream,
    * resampling = top-k (or Gumbel-k) by `logratio_q4`.
    *
    * Scale shape: explode + broadcast join against the B-row weights +
    * one hash aggregation — the corpus never shuffles. */
  def dsirScore(df: DataFrame, idCol: String, textCol: String,
                model: DsirWeights): DataFrame =
    Dedup.fanOut(df)
      .select(col(idCol), explode(wordFeatures(col(textCol))).as("__f"))
      .select(col(idCol),
        featureBucket(col("__f"), model.buckets).as("bucket"))
      .join(broadcast(model.weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("wq_q4")).as("logratio_q4"))

  /** A trained Naive Bayes scorer: vocab-bounded per-token log-likelihood
    * ratio weights (broadcast at score time) plus the two scalar terms —
    * the class-prior log-ratio and the out-of-vocabulary token weight,
    * both already quantized to 0.1 milli-nats. */
  final case class NaiveBayesModel(tokenWeights: DataFrame,
                                   priorQ4: Long, unknownQ4: Long)

  /** The ADDITIVE form of a Naive Bayes model: per-token class counts
    * plus document priors. Two count sets over disjoint labeled batches
    * merge by plain addition ([[naiveBayesMerge]]), which is what makes
    * the persisted classifier incrementally updatable — ratios aren't
    * additive, counts are. `tokenCounts` columns: (token, cp, cn). */
  final case class NaiveBayesCounts(tokenCounts: DataFrame,
                                    ndPos: Long, nd: Long)

  /** Aggregate a labeled batch into [[NaiveBayesCounts]]: one explode +
    * vocab-sized hash aggregation plus a 1-row prior collect. */
  def naiveBayesCounts(labeled: DataFrame, textCol: String,
                       labelCol: String): NaiveBayesCounts = {
    val counts = Dedup.fanOut(labeled)
      .select(col(labelCol).as("__y"),
        explode(wordTokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("cp"),
           sum(when(col("__y"), 0L).otherwise(1L)).as("cn"))
    val d = labeled.agg(
      coalesce(sum(when(col(labelCol), 1L).otherwise(0L)), lit(0L)),
      count(lit(1))).head()
    NaiveBayesCounts(counts, d.getLong(0), d.getLong(1))
  }

  /** Merge two count sets (disjoint labeled batches): full-outer sum on
    * token, scalar adds — exact, order-independent. */
  def naiveBayesMerge(a: NaiveBayesCounts, b: NaiveBayesCounts): NaiveBayesCounts = {
    val bb = b.tokenCounts.select(col("token"),
      col("cp").as("__bcp"), col("cn").as("__bcn"))
    NaiveBayesCounts(
      a.tokenCounts.join(bb, Seq("token"), "full_outer")
        .select(col("token"),
          (coalesce(col("cp"), lit(0L)) + coalesce(col("__bcp"), lit(0L))).as("cp"),
          (coalesce(col("cn"), lit(0L)) + coalesce(col("__bcn"), lit(0L))).as("cn")),
      a.ndPos + b.ndPos, a.nd + b.nd)
  }

  /** Derive the scoring-form model from counts: add-one smoothing over
    * vocab + the OOV pseudo-token, every log term quantized with
    * floor(1e4·ln) BEFORE summation (see [[charLmScore]]). The derived
    * weights are a pure function of the counts, so counts → model →
    * score is bit-reproducible wherever the counts came from (fresh
    * training, a disk round trip, or an incremental merge). */
  def naiveBayesFromCounts(c: NaiveBayesCounts): NaiveBayesModel = {
    val counts = c.tokenCounts.localCheckpoint(true) // totals + weights
    val t = counts.agg(coalesce(sum(col("cp")), lit(0L)),
      coalesce(sum(col("cn")), lit(0L)), count(lit(1))).head()
    val (np, nn, v) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val (ndPos, nd) = (c.ndPos, c.nd)
    require(nd > 0 && ndPos > 0 && ndPos < nd,
      "training needs at least one document of each class")
    def q(num: Long, den: Long): Long =
      math.floor(1e4 * math.log(num.toDouble / den.toDouble)).toLong
    val vs = v + 1 // vocab + the OOV pseudo-token, mirrored in unknownQ4
    val weights = counts.select(col("token"),
      (qlog(col("cp") + 1L, lit(np + vs)) -
       qlog(col("cn") + 1L, lit(nn + vs))).as("wq_q4"))
    NaiveBayesModel(weights, q(ndPos, nd) - q(nd - ndPos, nd),
      q(1L, np + vs) - q(1L, nn + vs))
  }

  /** Train a multinomial Naive Bayes quality classifier (the fastText-
    * style model-based filter of CCNet/GPT-3-era pipelines: label a seed
    * set "high quality" vs "raw", score the corpus, keep what scores
    * positive) — [[naiveBayesCounts]] composed with
    * [[naiveBayesFromCounts]].
    *
    * Scale shape: one explode + vocab-sized hash aggregation over the
    * LABELED set (labeled sets are small by construction), one 1-row
    * totals collect, one 1-row prior collect — the model is a
    * vocab-bounded frame plus two longs. */
  def naiveBayesTrain(labeled: DataFrame, textCol: String,
                      labelCol: String): NaiveBayesModel =
    naiveBayesFromCounts(naiveBayesCounts(labeled, textCol, labelCol))

  /** Score documents with a trained [[NaiveBayesModel]]: per doc,
    * score_q4 = prior + Σ_tokens wq(token) (OOV tokens take the smoothed
    * unknown weight), pred_pos = score > 0. Docs with no tokens are
    * absent (score them as unknown downstream).
    *
    * Scale shape: explode + broadcast join against the vocab-bounded
    * weights + one hash aggregation — the corpus never shuffles. */
  def naiveBayesScore(df: DataFrame, idCol: String, textCol: String,
                      model: NaiveBayesModel): DataFrame = {
    val w = model.tokenWeights.select(col("token").as("__tk"),
      col("wq_q4").as("__wq"))
    Dedup.fanOut(df)
      .select(col(idCol), explode(wordTokens(col(textCol))).as("__tok"))
      .join(broadcast(w), col("__tok") === col("__tk"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (lit(model.priorQ4) +
         sum(coalesce(col("__wq"), lit(model.unknownQ4)))).as("score_q4"))
      .withColumn("pred_pos", col("score_q4") > 0L)
  }

  // ----------------------- unigram (SentencePiece-style) segmentation

  /** Piece vocabulary for unigram segmentation over the corpus's
    * normalized, whitespace-split, length-capped words: EVERY single
    * character (so segmentation never fails), plus the top `topBigrams`
    * bigram and `topTrigrams` trigram substrings by corpus frequency
    * (count desc, piece asc — a deterministic total order). The piece
    * cost is a quantized -log2 frequency in pure integers:
    * cost = 2000 − 10·bitlen(count) per piece — a fixed base (the
    * -log p normalizer) plus a frequency rebate, so covering a word in
    * fewer, more frequent pieces always wins, exactly the unigram-LM
    * objective shape.
    * Returns (piece, len, cnt, cost).
    *
    * Scale shape: substring counting is one explode + hash agg per
    * length (map-side combined); top-N selection sorts only the DISTINCT
    * piece frame (vocabulary-sized, bounded), never the corpus. */
  def unigramVocab(df: DataFrame, textCol: String, maxWordLen: Int = 12,
                   topBigrams: Int = 200, topTrigrams: Int = 100): DataFrame = {
    require(maxWordLen >= 3, "maxWordLen must be >= 3")
    val words = df.select(explode(
        split(Dedup.normalizedText(coalesce(col(textCol), lit(""))), " ")).as("w"))
      .where(col("w") =!= "" && length(col("w")) <= maxWordLen)
    def counts(l: Int) = words
      .where(length(col("w")) >= l)
      .select(explode(expr(
        s"transform(sequence(1, length(w) - ${l - 1}), i -> substring(w, i, $l))"))
        .as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("cnt"))
    def top(l: Int, n: Int) = counts(l)
      .orderBy(col("cnt").desc, col("piece").asc).limit(n)
    counts(1).unionByName(top(2, topBigrams)).unionByName(top(3, topTrigrams))
      .select(col("piece"), length(col("piece")).as("len"), col("cnt"),
        (lit(2000) - length(bin(col("cnt"))) * 10).cast("long").as("cost"))
  }

  /** Viterbi segmentation of every distinct corpus word under
    * [[unigramVocab]]'s costs, minimizing (total cost, piece count)
    * lexicographically. The two objectives are fused into ONE integer DP
    * value — each piece contributes cost·64 + 1, and piece counts stay
    * < 64 — so the minimum is unique and NO tie-break convention can
    * leak into the output (equal-value argmins don't matter).
    *
    * Scale shape: the vocabulary (corpus alphabet + topN pieces — small
    * and bounded by construction) is collected once and broadcast; the
    * DP is O(len·3) row-local per word. That is the tokenizer-
    * application shape at 100 TB: a broadcast model, a map-only pass. */
  def unigramSegmentWords(df: DataFrame, textCol: String, maxWordLen: Int = 12,
                          topBigrams: Int = 200, topTrigrams: Int = 100): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pieceCost: Map[String, Long] =
      unigramVocab(df, textCol, maxWordLen, topBigrams, topTrigrams)
        .select("piece", "cost").as[(String, Long)]
        .collect().toMap // bounded: alphabet + topBigrams + topTrigrams
    val bc = spark.sparkContext.broadcast(pieceCost)
    df.select(explode(
        split(Dedup.normalizedText(coalesce(col(textCol), lit(""))), " ")).as("w"))
      .where(col("w") =!= "" && length(col("w")) <= maxWordLen)
      .distinct().as[String]
      .map { w =>
        val m = bc.value
        val n = w.length
        val INF = Long.MaxValue / 4
        val v = Array.fill(n + 1)(INF)
        v(0) = 0L
        var i = 1
        while (i <= n) {
          var l = 1
          while (l <= 3 && l <= i) {
            if (v(i - l) < INF) {
              m.get(w.substring(i - l, i)) match {
                case Some(c) =>
                  val cand = v(i - l) + c * 64 + 1
                  if (cand < v(i)) v(i) = cand
                case None =>
              }
            }
            l += 1
          }
          i += 1
        }
        // every single char is in the vocab, so v(n) is always finite
        (w, v(n) / 64, v(n) % 64)
      }
      .toDF("word", "cost", "n_pieces")
  }

  /** [[unigramSegmentWords]] transcribed to ANSI SQL: same vocabulary
    * derivation, same fused-integer DP — unrolled over word positions
    * (maxWordLen stages), which is what makes the oracle finite. Kept
    * adjacent to the implementation so the two stay in lockstep. */
  def unigramSegmentSql(maxWordLen: Int = 12, topBigrams: Int = 200,
                        topTrigrams: Int = 100): String = {
    val head = s"""
      WITH wr AS (SELECT UNNEST(string_split(nt, ' ')) AS w FROM
            (SELECT regexp_replace(trim(lower(COALESCE(text, ''))), '\\s+', ' ', 'g')
               AS nt FROM documents)),
      words_all AS (SELECT w FROM wr WHERE w <> '' AND length(w) <= $maxWordLen),
      c1 AS (SELECT substr(w, g.i, 1) AS piece, COUNT(*) AS cnt
             FROM words_all, LATERAL UNNEST(range(1, length(w) + 1)) AS g(i)
             GROUP BY 1),
      c2r AS (SELECT substr(w, g.i, 2) AS piece, COUNT(*) AS cnt
              FROM words_all, LATERAL UNNEST(range(1, length(w))) AS g(i)
              WHERE length(w) >= 2 GROUP BY 1),
      c3r AS (SELECT substr(w, g.i, 3) AS piece, COUNT(*) AS cnt
              FROM words_all, LATERAL UNNEST(range(1, length(w) - 1)) AS g(i)
              WHERE length(w) >= 3 GROUP BY 1),
      c2 AS (SELECT piece, cnt FROM (SELECT piece, cnt,
               row_number() OVER (ORDER BY cnt DESC, piece) AS rn FROM c2r)
             WHERE rn <= $topBigrams),
      c3 AS (SELECT piece, cnt FROM (SELECT piece, cnt,
               row_number() OVER (ORDER BY cnt DESC, piece) AS rn FROM c3r)
             WHERE rn <= $topTrigrams),
      vocab AS (SELECT piece,
                  (2000 - length(bin(cnt)) * 10) * 64 + 1 AS c
                FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2
                      UNION ALL SELECT * FROM c3)),
      words AS MATERIALIZED (SELECT DISTINCT w FROM words_all),
      cand AS (SELECT wo.w, g.i AS t, l.l AS l,
                 substr(wo.w, g.i - l.l + 1, l.l) AS piece
               FROM words wo,
                    LATERAL UNNEST(range(1, length(wo.w) + 1)) AS g(i),
                    (VALUES (1), (2), (3)) l(l)
               WHERE l.l <= g.i),
      edge AS MATERIALIZED (SELECT c.w, c.t, c.l, v.c FROM cand c
               JOIN vocab v ON v.piece = c.piece),
      dall0 AS MATERIALIZED (SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS v FROM words)"""
    val stages = (1 to maxWordLen).map { k =>
      s""",
      d$k AS (SELECT e.w, MIN(p.v + e.c) AS v
              FROM edge e JOIN dall${k - 1} p
                ON p.w = e.w AND p.pos = $k - e.l
              WHERE e.t = $k GROUP BY 1),
      dall$k AS MATERIALIZED (SELECT * FROM dall${k - 1}
                 UNION ALL SELECT w, $k AS pos, v FROM d$k)"""
    }.mkString
    val tail = s"""
      SELECT w AS word, CAST(v // 64 AS BIGINT) AS cost,
        CAST(v % 64 AS BIGINT) AS n_pieces
      FROM dall$maxWordLen WHERE pos = length(w)"""
    head + stages + tail
  }

  // ----------------------------------------------------- HTML cleaning

  /** HTML → text extraction as a pure column-expression chain (codegen'd
    * regexp/replace, no UDF): drop script/style/comment blocks, strip
    * remaining tags, decode the six common entities, collapse
    * whitespace. The raw-web-corpus cleaning step that precedes every
    * quality/dedup stage in a training-data pipeline.
    *
    * Deliberately engine-portable: patterns stay inside the regex subset
    * Java and RE2 agree on (inline (?is) flags, lazy quantifiers,
    * character classes — no backreferences, no lookaround), whitespace
    * is the explicit class [ \t\n\r] (Java's \s includes \x0B, RE2's
    * does not), and entity decode is literal replace() with &amp; LAST
    * (so "&amp;lt;" decodes to "&lt;", not "<"). */
  def stripHtml(s: Column): Column = {
    val noScript = regexp_replace(s, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        call_function("replace", c, lit(from), lit(to))
      }
    trim(regexp_replace(ent, "[ \\t\\n\\r]+", " "))
  }

  /** The same extraction chain as ANSI SQL over expression `s` — kept
    * adjacent to [[stripHtml]] so the two transcriptions stay in
    * lockstep (oracle construction for the q181 gate). */
  def stripHtmlSql(s: String): String = {
    val noBlocks =
      s"""regexp_replace(regexp_replace(regexp_replace($s,
         '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         '(?s)<!--.*?-->', ' ', 'g')"""
    val noTags = s"regexp_replace($noBlocks, '<[^>]*>', ' ', 'g')"
    // SQL literal escaping: the apostrophe doubles inside a '…' string,
    // the double-quote does not
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => s"replace($c, '$from', '$to')" }
    s"trim(regexp_replace($ent, '[ \\t\\n\\r]+', ' ', 'g'))"
  }
}
