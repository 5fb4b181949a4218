package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Registry, Stemmer}
import graft.operators.MinHash

/** Text-analysis operators over the `documents` corpus — the per-document
  * scoring surface of a training-data pipeline: language-ID heuristics,
  * quality scoring, tokenizer statistics, and content fingerprinting.
  *
  * Reference building blocks: `presto-main/.../scalar/StringFunctions.java`
  * (split/length/hamming), `JoniRegexpFunctions.java` (regexp_extract_all),
  * `ArrayFunctions` (distinct/filter); the composed heuristics are the
  * standard corpus-curation recipes (CCNet/Gopher-style quality signals).
  *
  * Scale: every query is per-row map work (split/filter/regex — all
  * codegen'd built-ins, no UDFs) followed by one aggregation keyed on a
  * low-cardinality column (lang/source) or a fingerprint; nothing joins or
  * shuffles the corpus against itself. This is exactly the shape that
  * streams through 100 TB: scan → project scores → partial agg → final agg.
  *
  * All heuristics are deterministic integer/boolean math or single-pass
  * ratios, so the DuckDB oracle replays them exactly.
  */
object TextAnalysis extends QueryPack {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.view(s, dir, "documents")

  /** Stopword profiles for the n-gram/stopword language heuristic. The
    * fixture corpus is synthetic word-salad, so the profiles are defined
    * over its actual vocabulary — the *mechanism* (per-profile hit ratios,
    * arg-max with thresholds) is the real language-ID shape. */
  private val FunctionWords = Seq("the", "a")
  private val TechWords = Seq("spark", "query", "table", "join", "scan",
    "hash", "agg", "sort")

  private def hitRatio(words: org.apache.spark.sql.Column, set: Seq[String]) =
    size(filter(words, w => set.map(s => w === s).reduce(_ || _)))
      .cast("double") / size(words)

  override def defs: Map[String, Q] = Map(
    // Byte-pair-encoding trainer (Sennrich et al. 2016,
    // arXiv:1508.07909 — the subword-tokenizer algorithm LLM pipelines
    // learn on their corpus): start from character sequences over the
    // word-frequency table, and per merge step (a) count adjacent
    // symbol pairs weighted by word frequency — ONE aggregate pass,
    // (b) take the arg-max pair ((count desc, pair asc) deterministic
    // tie-break; a single driver-side row, like a KMeans centroid),
    // (c) apply the merge everywhere with the native BpeMergePass fold
    // — one map-only pass. T merges = T (aggregate + map) passes over
    // the DISTINCT-WORD table (vocabulary-sized, not corpus-sized —
    // the standard BPE trick; at 100 TB the word-frequency table is
    // the only thing the loop touches). The DuckDB oracle replays the
    // ENTIRE training: per-step pair counting with list_transform,
    // the same arg-max, and the identical left-to-right greedy fold
    // via list_reduce — every learned merge, its count, and the
    // post-merge corpus token count must agree exactly.
    "q1a_bpe_train" -> ((s, dir) => {
      import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
      val words = docs(s, dir)
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(length(col("w")) > 0)
      var vocab = words.groupBy(col("w")).agg(count(lit(1)).as("wc"))
        .withColumn("seq", trim(regexp_replace(col("w"), "(.)", "$1 ")))
        .cache()
      val steps = (1 to 3).map { step =>
        val top = vocab
          .select(col("wc"),
            explode(toCol(graft.functions.WordNgrams(toExpr(col("seq")), 2)))
              .as("p"))
          .groupBy(col("p")).agg(sum(col("wc")).as("c"))
          .orderBy(col("c").desc, col("p")).limit(1).head()
        val pair = top.getString(0)
        val cnt = top.getLong(1)
        val Array(a, b) = pair.split(" ")
        val prev = vocab
        vocab = vocab.withColumn("seq",
          toCol(graft.functions.BpeMergePass(toExpr(col("seq")), a, b)))
          .cache()
        val toks = vocab
          .agg(sum(size(split(col("seq"), " ")).cast("long") * col("wc")))
          .head().getLong(0)
        prev.unpersist()
        (step.toLong, pair, cnt, toks)
      }
      vocab.unpersist()
      import s.implicits._
      steps.toDF("step", "pair", "cnt", "toks").orderBy(col("step"))
    }),

    // Tokenizer-aware sequence packing — the q1a trainer composed with
    // the qi5 packer: ENCODING is a broadcast lookup join against the
    // trained vocabulary (each word's post-merge token count — the
    // standard BPE serving shape; at 100 TB the vocab table is KBs and
    // the join is map-only), per-doc subword token counts come from one
    // doc_id aggregate, and packing is the same single window shuffle
    // as qi5 with a 128-token budget.
    "q1b_bpe_pack" -> ((s, dir) => {
      import org.apache.spark.sql.graft.ColumnBridge.{toCol, toExpr}
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(split(lower(col("text")), " ")).as("w"))
        .filter(length(col("w")) > 0)
      var vocab = d.groupBy(col("w")).agg(count(lit(1)).as("wc"))
        .withColumn("seq", trim(regexp_replace(col("w"), "(.)", "$1 ")))
        .cache()
      (1 to 3).foreach { _ =>
        val top = vocab
          .select(col("wc"),
            explode(toCol(graft.functions.WordNgrams(toExpr(col("seq")), 2)))
              .as("p"))
          .groupBy(col("p")).agg(sum(col("wc")).as("c"))
          .orderBy(col("c").desc, col("p")).limit(1).head()
        val Array(a, b) = top.getString(0).split(" ")
        val prev = vocab
        vocab = vocab.withColumn("seq",
          toCol(graft.functions.BpeMergePass(toExpr(col("seq")), a, b)))
          .cache()
        prev.unpersist()
      }
      val tokTable = vocab.select(col("w"),
        size(split(col("seq"), " ")).cast("long").as("ntok"))
      val docToks = d.join(broadcast(tokTable), "w")
        .groupBy(col("doc_id"), col("lang")).agg(sum(col("ntok")).as("toks"))
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docToks
        .withColumn("pack_id",
          floor(coalesce(sum(col("toks")).over(w), lit(0L)) / lit(128)))
        .groupBy(col("lang"), col("pack_id"))
        .agg(count(lit(1)).as("nd"), sum(col("toks")).as("fill"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_packs"), sum(col("nd")).as("n_docs"),
          sum(col("fill")).as("total_toks"), max(col("fill")).as("max_fill"))
        .orderBy(col("lang"))
    }),

    // Language-ID heuristic: stopword-profile hit ratios -> predicted
    // class, reported as a confusion matrix against the labeled lang.
    "q97_langid_confusion" -> ((s, dir) => {
      val scored = docs(s, dir)
        .withColumn("w", split(col("text"), " "))
        .withColumn("fn_ratio", hitRatio(col("w"), FunctionWords))
        .withColumn("tech_ratio", hitRatio(col("w"), TechWords))
        .withColumn("predicted",
          when(col("fn_ratio") >= 0.10, lit("en"))
            .when(col("tech_ratio") >= 0.30, lit("tech"))
            .otherwise(lit("other")))
      scored.groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("fn_ratio")), 4).as("avg_fn_ratio"),
          round(avg(col("tech_ratio")), 4).as("avg_tech_ratio"))
        .orderBy(col("lang"), col("predicted"))
    }),

    // Gopher-style quality signals: token count, type-token ratio, mean
    // word length, rare-token share -> composite score, summarized per
    // source (the dedup/filter decision unit of a curation pipeline).
    "q98_quality_score" -> ((s, dir) => {
      val q = docs(s, dir)
        .withColumn("w", split(col("text"), " "))
        .withColumn("n_tok", size(col("w")).cast("long"))
        .withColumn("ttr",
          size(array_distinct(col("w"))).cast("double") / col("n_tok"))
        .withColumn("mean_wlen",
          (col("n_chars") - (col("n_tok") - 1)).cast("double") / col("n_tok"))
        .withColumn("dup_share",
          size(filter(col("w"), x => x === "dup")).cast("double") / col("n_tok"))
        .withColumn("score",
          col("ttr") * 0.5
            + least(col("n_tok").cast("double") / 100.0, lit(1.0)) * 0.3
            + when(col("mean_wlen").between(3.0, 6.0), 0.2).otherwise(0.0)
            - col("dup_share"))
      q.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("score")), 4).as("avg_score"),
          round(min(col("score")), 4).as("min_score"),
          sum(when(col("score") < 0.45, 1L).otherwise(0L)).as("n_low"))
        .orderBy(col("source"))
    }),

    // Tokenizer statistics: whitespace tokens vs a BPE-ish regex chunker
    // (words split into <=4-char pieces), chars-per-token — the
    // token-budget accounting of a training pipeline, per lang.
    "q99_token_stats" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("ws_tok", size(split(col("text"), " ")).cast("long"))
        .withColumn("bpe_tok",
          size(regexp_extract_all(col("text"), lit("[a-z]{1,4}"), lit(0)))
            .cast("long"))
        .withColumn("cpt", col("n_chars").cast("double") / col("bpe_tok"))
        .groupBy(col("lang"))
        .agg(sum(col("ws_tok")).as("total_ws_tok"),
          sum(col("bpe_tok")).as("total_bpe_tok"),
          round(avg(col("cpt")), 4).as("avg_chars_per_tok"),
          round(sum(col("bpe_tok")).cast("double")
            / sum(col("ws_tok")), 4).as("bpe_expansion"))
        .orderBy(col("lang"))),

    // Bigram-LM cross-entropy scoring — the CCNet-style perplexity
    // quality filter: train add-1-smoothed bigram/unigram counts on the
    // corpus, score each document by its average -log2 P(w_i | w_{i-1}).
    // The LM tables are aggregates of the corpus (tiny next to it after
    // the count groupBy), joined back by bigram key — Catalyst/AQE picks
    // broadcast at this scale and a shuffle join when the vocabulary is
    // genuinely large; either plan is bucket-local, never all-pairs.
    "qh8_ngram_perplexity" -> ((s, dir) => {
      val words = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
      val bi = words.select(col("doc_id"), expr(
          "explode(transform(sequence(0, size(ws) - 2), " +
            "i -> struct(ws[i] AS w1, ws[i+1] AS w2)))").as("bg"))
        .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
      val bcnt = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      val ucnt = words.select(explode(col("ws")).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
      val vocab = ucnt.agg(count(lit(1)).as("v"))
      bi.filter(col("doc_id") < 20)
        .join(bcnt, Seq("w1", "w2"))
        .join(ucnt, Seq("w1"))
        .crossJoin(vocab)
        .withColumn("bits",
          -log2((col("cb") + 1).cast("double") / (col("cu") + col("v"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(col("bits")), 4).as("xent_bits"))
        .orderBy(col("doc_id"))
    }),

    // Content fingerprinting: 1-permutation min-hash over word 4-grams
    // (md5-derived so the oracle replays it) -> collision clusters, the
    // cheap first pass of a fuzzy-dedup cascade.
    "qa0_doc_fingerprint" -> ((s, dir) => {
      val fp = docs(s, dir)
        .withColumn("sh", MinHash.shingles(col("text"), k = 4))
        .withColumn("fp", array_min(transform(col("sh"),
          g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))))
      fp.groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .filter(col("n_docs") > 1)
        .orderBy(col("n_docs").desc, col("fp"))
    }),

    // Snowball English ("Porter2") stemming — the exact algorithm behind
    // the reference (`WordStemFunction.java:82` delegates to Lucene's
    // Snowball EnglishStemmer, no case folding) — through BOTH surfaces:
    // the SQL registry (word_stem / word_stem(w,'en')) and the Column API
    // (Stemmer.wordStem), plus an agreement bit so any divergence between
    // the two paths fails the gate. The oracle states the expected stems
    // (no stemmer exists in DuckDB); the algorithm itself is locked by
    // StemmerSuite, including the Porter1-divergent cases (ties, dying,
    // news, generalization).
    "qc4_word_stem" -> ((s, dir) => {
      Tables.register(s, dir)
      Registry.install(s)
      s.sql(
        """SELECT word, word_stem(word) AS stem_sql,
          |  word_stem(word, 'en') AS stem_en
          |FROM VALUES ('running'),('flies'),('caresses'),('ponies'),
          |  ('cats'),('happiness'),('relational'),('conditional'),
          |  ('connection'),('formalize'),('electricity'),('hopeful'),
          |  ('adjustment'),('replacement'),('controller'),('motoring'),
          |  ('sized'),('agreed'),('plastered'),('generalization'),
          |  ('ties'),('dying'),('news'),('communication')
          |  AS t(word)""".stripMargin)
        .withColumn("stem_col", Stemmer.wordStem(col("word")))
        .withColumn("agree", col("stem_col") === col("stem_sql"))
        .orderBy(col("word"))
    }),

    // Unicode normalization (reference `StringFunctions.java` normalize):
    // NFC fixes decomposed input to the composed form; NFD length shows
    // the decomposition. Inputs built from \u escapes (not SQL literals)
    // so the bytes are unambiguous on both engines.
    "qc5_normalize" -> ((s, dir) => {
      Registry.install(s)
      s.createDataFrame(Seq(
        (1L, "école"), // decomposed: e + COMBINING ACUTE
        (2L, "école"))) // composed e-acute
        .toDF("id", "s")
        .selectExpr("id", "normalize(s) AS nfc",
          "cast(length(normalize(s)) as bigint) AS nfc_len",
          "cast(length(normalize(s, 'NFD')) as bigint) AS nfd_len")
        .withColumn("is_ecole_nfc", col("nfc") === lit("école"))
        .orderBy(col("id"))
    })
  )

  private def hitRatioSql(set: Seq[String]): String =
    s"len(list_filter(w, x -> x IN (${set.map(w => s"'$w'").mkString(",")})))::DOUBLE / len(w)"

  /** The shared DuckDB replay of 3-step BPE training (see q1a): per
    * step, pair counts via list_transform, (count desc, pair asc)
    * arg-max, and the identical left-to-right greedy fold via
    * list_reduce. Ends at v3 (the trained vocabulary) / t1-t3 (token
    * counts); q1a reads the merge trail, q1b encodes the corpus with
    * the trained vocab. */
  private val bpeChain =
    """WITH w AS (
        |  SELECT w, count(*) AS wc FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS w
        |    FROM documents) t
        |  WHERE length(w) > 0 GROUP BY w),
        |v0 AS (SELECT w, wc,
        |  trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS seq FROM w),
        |p1 AS (SELECT pair, sum(wc) AS c FROM (
        |  SELECT wc, unnest(list_transform(range(1, len(sym)),
        |    i -> sym[i] || ' ' || sym[i + 1])) AS pair
        |  FROM (SELECT wc, string_split(seq, ' ') AS sym FROM v0) z) zz
        |  GROUP BY pair),
        |m1 AS (SELECT pair, c, string_split(pair, ' ')[1] AS pa,
        |  string_split(pair, ' ')[2] AS pb, replace(pair, ' ', '') AS pm
        |  FROM p1 ORDER BY c DESC, pair LIMIT 1),
        |v1 AS (SELECT w, wc,
        |  list_reduce(string_split(seq, ' '), (acc, s) -> CASE
        |    WHEN s = pb AND substr(acc, len(acc) - len(pa) + 1) = pa
        |      AND (len(acc) = len(pa) OR substr(acc, len(acc) - len(pa), 1) = ' ')
        |    THEN substr(acc, 1, len(acc) - len(pa)) || pm
        |    ELSE acc || ' ' || s END) AS seq
        |  FROM v0 CROSS JOIN m1),
        |t1 AS (SELECT sum(len(string_split(seq, ' ')) * wc) AS toks FROM v1),
        |p2 AS (SELECT pair, sum(wc) AS c FROM (
        |  SELECT wc, unnest(list_transform(range(1, len(sym)),
        |    i -> sym[i] || ' ' || sym[i + 1])) AS pair
        |  FROM (SELECT wc, string_split(seq, ' ') AS sym FROM v1) z) zz
        |  GROUP BY pair),
        |m2 AS (SELECT pair, c, string_split(pair, ' ')[1] AS pa,
        |  string_split(pair, ' ')[2] AS pb, replace(pair, ' ', '') AS pm
        |  FROM p2 ORDER BY c DESC, pair LIMIT 1),
        |v2 AS (SELECT w, wc,
        |  list_reduce(string_split(seq, ' '), (acc, s) -> CASE
        |    WHEN s = pb AND substr(acc, len(acc) - len(pa) + 1) = pa
        |      AND (len(acc) = len(pa) OR substr(acc, len(acc) - len(pa), 1) = ' ')
        |    THEN substr(acc, 1, len(acc) - len(pa)) || pm
        |    ELSE acc || ' ' || s END) AS seq
        |  FROM v1 CROSS JOIN m2),
        |t2 AS (SELECT sum(len(string_split(seq, ' ')) * wc) AS toks FROM v2),
        |p3 AS (SELECT pair, sum(wc) AS c FROM (
        |  SELECT wc, unnest(list_transform(range(1, len(sym)),
        |    i -> sym[i] || ' ' || sym[i + 1])) AS pair
        |  FROM (SELECT wc, string_split(seq, ' ') AS sym FROM v2) z) zz
        |  GROUP BY pair),
        |m3 AS (SELECT pair, c, string_split(pair, ' ')[1] AS pa,
        |  string_split(pair, ' ')[2] AS pb, replace(pair, ' ', '') AS pm
        |  FROM p3 ORDER BY c DESC, pair LIMIT 1),
        |v3 AS (SELECT w, wc,
        |  list_reduce(string_split(seq, ' '), (acc, s) -> CASE
        |    WHEN s = pb AND substr(acc, len(acc) - len(pa) + 1) = pa
        |      AND (len(acc) = len(pa) OR substr(acc, len(acc) - len(pa), 1) = ' ')
        |    THEN substr(acc, 1, len(acc) - len(pa)) || pm
        |    ELSE acc || ' ' || s END) AS seq
        |  FROM v2 CROSS JOIN m3),
        |t3 AS (SELECT sum(len(string_split(seq, ' ')) * wc) AS toks FROM v3)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q1a_bpe_train" -> (bpeChain +
      """
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, (SELECT pair FROM m1) AS pair,
        |    CAST((SELECT c FROM m1) AS BIGINT) AS cnt,
        |    CAST((SELECT toks FROM t1) AS BIGINT) AS toks
        |  UNION ALL SELECT 2, (SELECT pair FROM m2),
        |    CAST((SELECT c FROM m2) AS BIGINT),
        |    CAST((SELECT toks FROM t2) AS BIGINT)
        |  UNION ALL SELECT 3, (SELECT pair FROM m3),
        |    CAST((SELECT c FROM m3) AS BIGINT),
        |    CAST((SELECT toks FROM t3) AS BIGINT)) u
        |ORDER BY step""".stripMargin),

    // Tokenizer-aware packing: encode via the TRAINED vocab (the word
    // table carries each word's post-merge token count — encoding is a
    // vocabulary-sized lookup join, the standard BPE serving shape),
    // then pack per-lang into 128-token budgets exactly like qi5.
    "q1b_bpe_pack" -> (bpeChain +
      """,
        |dw AS (SELECT doc_id, lang, w FROM (
        |    SELECT doc_id, lang,
        |      unnest(string_split(lower(text), ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0),
        |tok AS (SELECT w, len(string_split(seq, ' ')) AS ntok FROM v3),
        |dt AS (SELECT doc_id, lang, sum(ntok) AS toks
        |       FROM dw JOIN tok USING (w) GROUP BY doc_id, lang),
        |pk AS (SELECT lang, toks,
        |  CAST(floor(coalesce(sum(toks) OVER (PARTITION BY lang
        |    ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 128)
        |  AS BIGINT) AS pack_id FROM dt),
        |g AS (SELECT lang, pack_id, count(*) AS nd, sum(toks) AS fill
        |      FROM pk GROUP BY 1, 2)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_packs,
        |  CAST(sum(nd) AS BIGINT) AS n_docs,
        |  CAST(sum(fill) AS BIGINT) AS total_toks,
        |  CAST(max(fill) AS BIGINT) AS max_fill
        |FROM g GROUP BY lang ORDER BY lang""".stripMargin),

    // Expected Snowball-English (Porter2) stems, locked per-step in
    // StemmerSuite against the published algorithm; agreement between the
    // SQL and Column paths is asserted in-query.
    "qc4_word_stem" ->
      """SELECT word, stem AS stem_sql, stem AS stem_en, stem AS stem_col,
        |  true AS agree
        |FROM (VALUES
        |  ('running', 'run'), ('flies', 'fli'), ('caresses', 'caress'),
        |  ('ponies', 'poni'), ('cats', 'cat'), ('happiness', 'happi'),
        |  ('relational', 'relat'), ('conditional', 'condit'),
        |  ('connection', 'connect'), ('formalize', 'formal'),
        |  ('electricity', 'electr'), ('hopeful', 'hope'),
        |  ('adjustment', 'adjust'), ('replacement', 'replac'),
        |  ('controller', 'control'), ('motoring', 'motor'),
        |  ('sized', 'size'), ('agreed', 'agre'), ('plastered', 'plaster'),
        |  ('generalization', 'general'), ('ties', 'tie'),
        |  ('dying', 'die'), ('news', 'news'),
        |  ('communication', 'communic')) t(word, stem)
        |ORDER BY word""".stripMargin,

    "qc5_normalize" ->
      """WITH t(id, s) AS (VALUES
        |  (CAST(1 AS BIGINT), 'e' || chr(769) || 'cole'),
        |  (CAST(2 AS BIGINT), chr(233) || 'cole'))
        |SELECT id, nfc_normalize(s) AS nfc,
        |  CAST(length(nfc_normalize(s)) AS BIGINT) AS nfc_len,
        |  CAST(6 AS BIGINT) AS nfd_len,
        |  nfc_normalize(s) = chr(233) || 'cole' AS is_ecole_nfc
        |FROM t ORDER BY id""".stripMargin,

    "q97_langid_confusion" ->
      s"""WITH d AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
         |r AS (SELECT lang,
         |        ${hitRatioSql(FunctionWords)} AS fn_ratio,
         |        ${hitRatioSql(TechWords)} AS tech_ratio
         |      FROM d),
         |p AS (SELECT lang, fn_ratio, tech_ratio,
         |        CASE WHEN fn_ratio >= 0.10 THEN 'en'
         |             WHEN tech_ratio >= 0.30 THEN 'tech'
         |             ELSE 'other' END AS predicted
         |      FROM r)
         |SELECT lang, predicted, count(*) AS n,
         |  round(avg(fn_ratio), 4) AS avg_fn_ratio,
         |  round(avg(tech_ratio), 4) AS avg_tech_ratio
         |FROM p GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,

    "q98_quality_score" ->
      """WITH d AS (
        |  SELECT source, n_chars, string_split(text, ' ') AS w FROM documents),
        |m AS (
        |  SELECT source, len(w) AS n_tok,
        |    len(list_distinct(w))::DOUBLE / len(w) AS ttr,
        |    (n_chars - (len(w) - 1))::DOUBLE / len(w) AS mean_wlen,
        |    len(list_filter(w, x -> x = 'dup'))::DOUBLE / len(w) AS dup_share
        |  FROM d),
        |q AS (
        |  SELECT source,
        |    ttr * 0.5 + least(n_tok::DOUBLE / 100.0, 1.0) * 0.3
        |      + CASE WHEN mean_wlen BETWEEN 3.0 AND 6.0
        |             THEN 0.2 ELSE 0.0 END
        |      - dup_share AS score
        |  FROM m)
        |SELECT source, count(*) AS n_docs,
        |  round(avg(score), 4) AS avg_score,
        |  round(min(score), 4) AS min_score,
        |  CAST(sum(CASE WHEN score < 0.45 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
        |FROM q GROUP BY source ORDER BY source""".stripMargin,

    "q99_token_stats" ->
      """WITH d AS (
        |  SELECT lang, n_chars,
        |    len(string_split(text, ' ')) AS ws_tok,
        |    len(regexp_extract_all(text, '[a-z]{1,4}')) AS bpe_tok
        |  FROM documents)
        |SELECT lang,
        |  CAST(sum(ws_tok) AS BIGINT) AS total_ws_tok,
        |  CAST(sum(bpe_tok) AS BIGINT) AS total_bpe_tok,
        |  round(avg(n_chars::DOUBLE / bpe_tok), 4) AS avg_chars_per_tok,
        |  round(sum(bpe_tok)::DOUBLE / sum(ws_tok), 4) AS bpe_expansion
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "qa0_doc_fingerprint" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |                 for i in range(1, len(w) - 2)]) AS s
        |  FROM d),
        |fp AS (SELECT doc_id,
        |  list_min(list_transform(s,
        |    g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS fp
        |  FROM sh)
        |SELECT fp, count(*) AS n_docs, min(doc_id) AS first_doc,
        |  max(doc_id) AS last_doc
        |FROM fp GROUP BY fp HAVING count(*) > 1
        |ORDER BY n_docs DESC, fp""".stripMargin,

    "qh8_ngram_perplexity" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |  FROM w, UNNEST(range(1, len(ws))) AS t(i)),
        |bc AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
        |uc AS (
        |  SELECT u.w1, count(*) AS cu
        |  FROM (SELECT unnest(ws) AS w1 FROM w) u GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM uc)
        |SELECT bi.doc_id, count(*) AS n_bigrams,
        |  round(avg(-log2((cb + 1.0) / (cu + v.v))), 4) AS xent_bits
        |FROM bi JOIN bc USING (w1, w2) JOIN uc ON uc.w1 = bi.w1, v
        |WHERE bi.doc_id < 20
        |GROUP BY bi.doc_id ORDER BY bi.doc_id""".stripMargin
  )
}
