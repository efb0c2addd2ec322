package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for large-scale training-data pipelines,
  * beyond the reference's surface: exact duplicated-span detection (the
  * substring-dedup step of Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"), corpus-wide paragraph dedup with text
  * reassembly (the MassiveText/RefinedWeb pipeline step), token-budget
  * domain mixing (deterministic down-sampling to per-domain token
  * targets), and greedy sequence packing (fixed-budget example packing
  * for pretraining batches).
  *
  * All four are built shuffle-minimal: span detection shuffles gram
  * hashes (8 bytes/gram) not gram text, paragraph dedup shuffles
  * paragraph hashes once, domain mixing is bucketed so no window ever
  * spans a whole domain, and packing is one repartition + in-partition
  * external sort with O(1) streaming state.
  */
object CorpusOps {

  /** Diff two corpus snapshots by a stable id — the dataset-ops
    * primitive behind "what changed between crawl v1 and v2": rows
    * only in `newDf` are `added`, only in `oldDf` are `removed`,
    * present in both with differing payload fingerprints are
    * `changed`, otherwise `unchanged`. The payload compare is the
    * normalized 64-bit fingerprint ([[TextOps.fingerprint64]]:
    * lowercase, trim, collapsed whitespace), so formatting-only edits
    * do NOT count as changes — the semantics a dedup-centric pipeline
    * wants; null payloads compare null-safely (null == null is
    * unchanged). Ids must be unique per snapshot (a duplicate id
    * makes "the" row ill-defined; the join would fan out).
    *
    * Returns (id, status). Scale shape: ONE full-outer shuffle join on
    * the id — the minimum for any diff — with 8-byte fingerprints
    * computed map-side, so payload text never shuffles; both sides
    * stream, nothing collects. At 100 TB this is exactly the
    * fingerprint-exchange cost of exact dedup. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   idCol: String, payloadCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"),
      TextOps.fingerprint64(col(payloadCol)).as("__fpo"),
      lit(1).as("__po"))
    val n = newDf.select(col(idCol).as("id"),
      TextOps.fingerprint64(col(payloadCol)).as("__fpn"),
      lit(1).as("__pn"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__po").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .when(!(col("__fpo") <=> col("__fpn")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Word-level duplicated-span detection: maximal spans every word of
    * which is covered by some `k`-gram occurring at least `minCount`
    * times in the whole corpus (including within-document repeats, as in
    * the suffix-array substring dedup of Lee et al. 2022 §4.1 — this is
    * its k-gram-resolution equivalent: any duplicated substring of
    * ≥ k words is found exactly; shorter duplicates are invisible).
    *
    * Returns (doc_id, span_id, span_start, span_end, span_len) with
    * word-index bounds inclusive; documents without duplicated spans are
    * absent. Touching/overlapping k-gram intervals merge into one span.
    *
    * Scale shape: tokens explode to (doc_id, pos, xxhash64(gram)) — the
    * gram STRING never shuffles, only its 8-byte hash. Gram counts come
    * from a map-side-combined groupBy on the hash alone; the surviving
    * duplicate-hash set (small — duplication is the exception) probes
    * the gram rows via a left-semi join that AQE resolves to a
    * broadcast, so full gram rows never exchange. One shuffle then
    * re-partitions surviving positions by doc_id for the interval merge
    * (lag/cumsum windows + groupBy on the same key — single exchange,
    * bounded by document length, never by corpus size). Collision risk of hashing grams is the documented
    * fingerprint64-style birthday bound (~2.7e-2 at 10⁹ DISTINCT grams);
    * collisions only ever over-flag a span, never drop one.
    */
  def duplicatedSpans(df: DataFrame, id: Column, text: Column,
                      k: Int = 8, minCount: Int = 2): DataFrame = {
    require(k >= 1, s"duplicatedSpans: k must be >= 1, got $k")
    require(minCount >= 2,
      s"duplicatedSpans: minCount must be >= 2, got $minCount")
    // Gram hashing runs through the native WordNgramHashes expression:
    // bit-for-bit `transform(TextOps.wordNgrams(text,k), xxhash64)`
    // (equivalence is pinned by NativeExprSpec across tokenization edge
    // cases), but a single codegen'd pass per document instead of four
    // nested interpreted higher-order functions — this is the hot inner
    // loop (every word passes through it k times).
    val grams = df.select(id.as("doc_id"),
        posexplode(org.apache.spark.sql.graft.NativeFunctions
          .wordNgramHashesNative(text, k)).as(Seq("pos", "gh")))
    // Duplicate-hash set via groupBy + semi-join rather than a
    // count-over-window: the window would shuffle AND sort every
    // (doc_id, pos, gh) gram row globally; the groupBy shuffles only the
    // 8-byte hash with map-side partial counts, and the surviving
    // duplicate set is small (duplication is the exception), so AQE
    // turns the semi-join into a broadcast probe — the gram rows
    // themselves never exchange.
    val dupHashes = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select("gh")
    val hits = grams.join(dupHashes, Seq("gh"), "left_semi")
      .select("doc_id", "pos")
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prev = lag(col("pos"), 1).over(wDoc)
    hits
      .withColumn("ns",
        when(prev.isNull || col("pos") > prev + k, 1).otherwise(0))
      .withColumn("span_id", sum(col("ns")).over(wDoc))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"),
        (max(col("pos")) - min(col("pos")) + lit(k)).as("span_len"))
  }

  /** Remove every duplicated span found by [[duplicatedSpans]] from the
    * text (Lee et al. 2022's dedup action), keeping the surviving words
    * joined by single spaces. Documents made of one giant duplicated
    * span come back as empty strings — downstream length filters drop
    * them, exactly as in the published pipeline.
    *
    * Scale shape: spans aggregate to one array per document (bounded by
    * document length in the worst case — span counts are tiny in
    * practice), broadcast-free equi-join back on doc_id, then the strip
    * is pure codegen'd Column algebra (indexed `filter` + `exists`).
    */
  def removeDuplicatedSpans(df: DataFrame, id: Column, text: Column,
                            k: Int = 8, minCount: Int = 2): DataFrame = {
    val spans = duplicatedSpans(df, id, text, k, minCount)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    val toks = split(lower(trim(text)), "\\s+")
    df.join(spans, df(idName(df, id)) === spans("doc_id"), "left")
      .drop(spans("doc_id"))
      .withColumn("cleaned_text",
        // both branches re-join tokens with single spaces so the output
        // is canonical whitespace regardless of the input's spacing
        when(col("__spans").isNull, array_join(toks, " "))
          .otherwise(array_join(
            filter(toks, (_, i) =>
              !exists(col("__spans"),
                s => i >= s("span_start") && i <= s("span_end"))),
            " ")))
      .drop("__spans")
  }

  private def idName(df: DataFrame, id: Column): String = {
    val n = id.toString
    require(df.columns.contains(n),
      s"removeDuplicatedSpans: id must be a plain column of df, got $n")
    n
  }

  /** Corpus-wide paragraph dedup with reassembly: split each page on
    * `delim`, keep only the FIRST occurrence of every distinct paragraph
    * corpus-wide (first = smallest (page order key, paragraph index)),
    * and rebuild each page from its surviving paragraphs in original
    * order — the boilerplate/chrome removal step of the MassiveText and
    * RefinedWeb pipelines.
    *
    * Returns (page, n_paras, n_kept, rebuilt) — `rebuilt` is null when
    * every paragraph of the page was seen earlier.
    *
    * Scale shape: paragraphs explode narrowly, first-occurrence is ONE
    * row_number window partitioned by md5(paragraph) (shuffles the
    * 16-byte hash + location, not page text), reassembly is one groupBy
    * per page with an in-group sort over the page's own paragraphs.
    * md5 (vs xxhash64) keeps the grouping key reproducible by any other
    * engine; swap in fingerprint64 for pure-speed pipelines.
    */
  def paragraphDedup(df: DataFrame, page: Column, text: Column,
                     delim: String = "\\n{2,}"): DataFrame = {
    val paras = df.select(page.as("page"),
        posexplode(split(text, delim)).as(Seq("idx", "para")))
    val first = row_number().over(
      Window.partitionBy(md5(col("para"))).orderBy(col("page"), col("idx")))
    val kept = paras.withColumn("__rk", first)
    kept.groupBy(col("page"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("__rk") === 1, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__rk") === 1, struct(col("idx"), col("para"))))),
            s => s("para")),
          "\n\n").as("__joined"))
      .withColumn("rebuilt",
        when(col("n_kept") > 0, col("__joined")))
      .drop("__joined")
  }

  /** Token-budget domain mixing: deterministically select documents per
    * domain until the domain's token budget is filled — the "data
    * mixture" step that turns raw per-domain corpora into the weighted
    * blend a training run actually consumes. A document is selected iff
    * it STARTS before the budget boundary in the domain's hash order
    * (start-fit rule: cumulative tokens before the doc < budget), so
    * every domain overshoots by at most one document and selection is a
    * pure function of (id, seed) — reruns and engines agree exactly.
    *
    * `budget` is evaluated per row (constant per domain), so callers
    * express weighted mixes as expressions over the domain column.
    *
    * Scale shape: the selection order md5(id:seed) is split into 16
    * prefix buckets; pass 1 aggregates per-(domain, bucket) token sums
    * (tiny frame: |domains|·16 rows) and turns them into bucket start
    * offsets; pass 2 computes the within-bucket running sum and adds the
    * offset — equivalent to one global per-domain cumulative sum, but no
    * window partition ever exceeds 1/16 of a domain, so a single
    * mega-domain cannot serialize onto one task. Deepen the prefix to
    * 2+ hex chars (256+ buckets) for extreme skew.
    */
  def tokenBudgetMix(df: DataFrame, id: Column, domain: Column,
                     text: Column, budget: Column,
                     seed: String = "s42"): DataFrame = {
    val base = df.select(id.as("doc_id"), domain.as("domain"),
        budget.cast("long").as("budget"),
        TextOps.tokenCount(text).cast("long").as("tok"),
        md5(concat(id.cast("string"), lit(":" + seed))).as("__h"))
      .withColumn("__b", substring(col("__h"), 1, 1))
    val offsets = base.groupBy(col("domain"), col("__b"))
      .agg(sum(col("tok")).as("__bsum"))
      .withColumn("__off",
        sum(col("__bsum")).over(
          Window.partitionBy("domain").orderBy("__b")) - col("__bsum"))
      .select("domain", "__b", "__off")
    val wb = Window.partitionBy(col("domain"), col("__b"))
      .orderBy(col("__h"), col("doc_id"))
    base.join(broadcast(offsets), Seq("domain", "__b"))
      .withColumn("__cum", col("__off") + sum(col("tok")).over(wb))
      .filter(col("__cum") - col("tok") < col("budget"))
      .select(col("doc_id"), col("domain"), col("tok"), col("budget"),
        col("__cum").as("cum_tok"))
  }

  /** Greedy sequence packing: walk each group's documents in `order` and
    * pack them into consecutive bins of at most `budget` tokens (a
    * document never splits across bins; a document alone larger than the
    * budget still gets its own bin) — the example-packing step that
    * turns a cleaned corpus into fixed-length pretraining sequences.
    * Returns (grp, ord, tok, bin) with bins numbered from 1 per group.
    *
    * Packing is inherently sequential per group, so the shape is ONE
    * hash repartition on the group key + an in-partition external sort
    * (secondary-sort pattern) + a streaming fold with O(1) state — no
    * group is ever materialized, arbitrarily large groups stream
    * through. This is the minimal-shuffle plan for an order-dependent
    * per-group scan; nothing here collects to the driver.
    */
  def packSequences(df: DataFrame, group: Column, order: Column,
                    tokens: Column, budget: Long): DataFrame = {
    require(budget >= 1, s"packSequences: budget must be >= 1, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val prep = df.select(group.cast("string").as("grp"),
        order.cast("long").as("ord"), tokens.cast("long").as("tok"))
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("ord"))
      .as[(String, Long, Long)]
    prep.mapPartitions { it =>
      var curGrp: String = null
      var bin = 0L
      var fill = 0L
      it.map { case (grp, ord, tok) =>
        if (grp != curGrp) { curGrp = grp; bin = 1L; fill = tok }
        else if (fill + tok > budget) { bin += 1L; fill = tok }
        else fill += tok
        (grp, ord, tok, bin)
      }
    }.toDF("grp", "ord", "tok", "bin")
  }

  /** Sliding-window token chunking — the retrieval/embedding prep step
    * that turns documents into overlapping fixed-size windows. Tokens
    * are the house-rule `\s+` words of the trimmed text (empties
    * dropped); a window starts at every multiple of `stride` below the
    * token count, so the last window may be short and consecutive
    * windows overlap by `chunkTokens - stride` tokens. Returns
    * (doc_id, chunk_id, chunk_start, n_chunk_tokens, chunk) with
    * chunk_id counting windows from 0 and chunk_start the 0-based
    * token offset. Empty/blank documents produce no rows.
    *
    * Scale shape: pure row-local Column algebra (split once, slice per
    * window) + one posexplode — no shuffle, no UDF; at 100 TB this is
    * a map-only pass whose output feeds the embedding stage. */
  def slidingChunks(df: DataFrame, id: Column, text: Column,
                    chunkTokens: Int = 256,
                    stride: Int = 192): DataFrame = {
    require(chunkTokens >= 1,
      s"slidingChunks: chunkTokens must be >= 1, got $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"slidingChunks: stride must be in [1, chunkTokens], got $stride")
    val toksOf = (t: Column) => filter(split(trim(t), "\\s+"),
      w => w =!= "")
    // bind the token array as a lambda variable (same Catalyst
    // no-CSE-into-lambdas rule as wordNgrams: inlining the split would
    // re-tokenize once per window)
    val chunksOf = (toks: Column) =>
      when(size(toks) > 0,
        transform(sequence(lit(0), size(toks) - 1, lit(stride)),
          st => struct(st.as("st"),
            slice(toks, st + 1, lit(chunkTokens)).as("w"))))
        .otherwise(array().cast("array<struct<st:int,w:array<string>>>"))
    df.select(id.as("doc_id"),
        posexplode(element_at(
          transform(array(toksOf(text)), chunksOf), 1))
          .as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("chunk_id"),
        col("c.st").as("chunk_start"),
        size(col("c.w")).as("n_chunk_tokens"),
        array_join(col("c.w"), " ").as("chunk"))
  }

  /** Sentence segmentation at regex resolution: non-overlapping matches
    * of `[^.!?]+[.!?]+` (a maximal punctuation-free run plus its
    * terminal punctuation run), trimmed, empties dropped. A trailing
    * un-punctuated fragment is NOT a sentence — the same convention the
    * C4 sentence-count rule uses. RE2-portable, so SQL oracles replay
    * it verbatim. */
  def sentences(text: Column): Column =
    filter(transform(regexp_extract_all(text,
        lit("[^.!?]+[.!?]+"), lit(0)), s => trim(s)),
      s => s =!= "")

  /** Corpus-wide sentence-level dedup with document reassembly — the
    * finer-grained sibling of [[paragraphDedup]]: every sentence keeps
    * only its first occurrence corpus-wide (ordered by document id,
    * then position), and each document is rebuilt from its surviving
    * sentences joined by a single space. Returns (page, n_sents,
    * n_kept, rebuilt) with rebuilt null when nothing survives.
    *
    * Scale shape: one explode + one window partitioned by the sentence
    * md5 (shuffle is bounded by sentence text, heavily compressible) +
    * one groupBy on the page key for reassembly. No driver state. */
  def sentenceDedup(df: DataFrame, page: Column,
                    text: Column): DataFrame = {
    val sents = df.select(page.as("page"),
      posexplode(sentences(text)).as(Seq("idx", "sent")))
    val first = row_number().over(
      Window.partitionBy(md5(col("sent")))
        .orderBy(col("page"), col("idx")))
    sents.withColumn("__rk", first)
      .groupBy(col("page"))
      .agg(count(lit(1)).as("n_sents"),
        sum(when(col("__rk") === 1, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__rk") === 1, struct(col("idx"), col("sent"))))),
            s => s("sent")),
          " ").as("__joined"))
      .withColumn("rebuilt",
        when(col("n_kept") > 0, col("__joined")))
      .drop("__joined")
  }

  /** Corpus lexical-diversity profile per key — the datasheet numbers
    * next to TTR/hapax (which live in the vocab-stats query): Yule's
    * K = 10⁴·(Σn² − N)/N² (repeat-rate characteristic, Yule 1944),
    * Simpson's D = Σn(n−1)/(N(N−1)) (collision probability), and the
    * Zipf rank–frequency fit — OLS slope and r² of log(freq) on
    * log(rank) over the type table (natural text ≈ −1; templated or
    * boilerplate-heavy corpora flatten toward 0, a standard curation
    * health check).
    *
    *   - n = per-type token count, N = Σn per key.
    *   - Zipf ranks come from a row_number window PARTITIONED BY the
    *     key over the type table (types-per-key cardinality, not row
    *     cardinality). Tie order among equal frequencies permutes
    *     ranks only within a tie block, which leaves the fitted
    *     point SET — hence the OLS fit — unchanged.
    *
    * Scale shape: tokenize → one map-side-combinable (key, token)
    * count, one keyed window over types, one algebraic aggregate.
    * Token text shuffles once (the unavoidable type-count exchange —
    * same cost class as q_vocab_stats). */
  def lexicalProfile(df: DataFrame, key: Column, text: Column)
      : DataFrame = {
    val toks = df.select(key.as("key"),
      explode(filter(split(lower(trim(text)), "\\s+"),
        w => w =!= "")).as("__tok"))
    val types = toks.groupBy(col("key"), col("__tok"))
      .agg(count(lit(1)).as("__n"))
    val wr = Window.partitionBy(col("key"))
      .orderBy(col("__n").desc, col("__tok"))
    val pts = types
      .withColumn("__lr", log(row_number().over(wr).cast("double")))
      .withColumn("__lf", log(col("__n").cast("double")))
    pts.groupBy(col("key")).agg(
      count(lit(1)).as("n_types"),
      sum(col("__n")).as("n_tokens"),
      ((lit(1e4) * (sum(col("__n") * col("__n")) - sum(col("__n")))) /
        (sum(col("__n")) * sum(col("__n")))).as("yule_k"),
      (sum(col("__n") * (col("__n") - 1)) /
        (sum(col("__n")) * (sum(col("__n")) - lit(1)))).as("simpson_d"),
      (covar_pop(col("__lr"), col("__lf")) / var_pop(col("__lr")))
        .as("zipf_slope"),
      (covar_pop(col("__lr"), col("__lf")) *
        covar_pop(col("__lr"), col("__lf")) /
        (var_pop(col("__lr")) * var_pop(col("__lf")))).as("zipf_r2"))
  }
}
