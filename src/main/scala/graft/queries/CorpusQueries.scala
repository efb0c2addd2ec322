package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{CorpusOps, LmOps, TextOps}

/** Driver-contract queries for the corpus-preparation operators
  * (CorpusOps): duplicated-span detection, paragraph dedup with
  * reassembly, token-budget domain mixing, greedy sequence packing.
  * Every oracle replays the op's exact semantics in DuckDB SQL — the
  * packing oracle walks the greedy fold with a recursive CTE. */
object CorpusQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dup_spans" -> ((s, dir) => {
      CorpusOps.duplicatedSpans(t(s, dir, "documents"),
          col("doc_id"), col("text"), k = 8)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("span_len")).as("dup_words"),
          max(col("span_len")).cast("long").as("max_span_len"))
        .orderBy("doc_id")
    }),
    "q_para_dedup" -> ((s, dir) => {
      // documents have no native paragraph breaks, so build pages from
      // the corpus itself: every doc appears on two pages (its text is
      // one paragraph), so the second occurrence must be stripped and
      // each page rebuilt — the oracle constructs the identical pages.
      val docs = t(s, dir, "documents")
      val pages = docs.select((col("doc_id") % 53).as("page_id"),
          col("doc_id").as("ord"), col("text"))
        .union(docs.select(((col("doc_id") * 7 + 3) % 53).as("page_id"),
          (col("doc_id") + 1000000L).as("ord"), col("text")))
        .groupBy(col("page_id"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("ord"),
            col("text")))), s => s("text")), "\n\n").as("ptext"))
      CorpusOps.paragraphDedup(pages, col("page_id"), col("ptext"))
        .select(col("page").as("page_id"),
          col("n_paras").cast("long").as("n_paras"),
          col("n_kept").cast("long").as("n_kept"),
          md5(col("rebuilt")).as("rebuilt_md5"))
        .orderBy("page_id")
    }),
    "q_domain_mix" -> ((s, dir) => {
      val budget = lit(200) + lit(40) *
        substring(col("source"), 4, 10).cast("int")
      CorpusOps.tokenBudgetMix(t(s, dir, "documents"), col("doc_id"),
          col("source"), col("text"), budget)
        .groupBy(col("domain").as("source"))
        .agg(count(lit(1)).as("n_sel"),
          sum(col("tok")).as("tok_sel"),
          max(col("budget")).as("budget"),
          round(sum(col("tok")).cast("double") / max(col("budget")), 4)
            .as("util"))
        .orderBy("source")
    }),
    "q_dup_span_removal" -> ((s, dir) => {
      // Lee et al. 2022's dedup ACTION: strip every duplicated span and
      // rebuild the text; the oracle rebuilds identically in SQL and
      // md5-compares the cleaned corpus.
      CorpusOps.removeDuplicatedSpans(t(s, dir, "documents"),
          col("doc_id"), col("text"), k = 8)
        .select(col("doc_id"),
          md5(col("cleaned_text")).as("clean_md5"),
          length(col("cleaned_text")).cast("long").as("clean_len"))
        .orderBy("doc_id")
    }),
    "q_lm_perplexity" -> ((s, dir) => {
      // CCNet-style fluency scoring: self-trained add-0.4 bigram LM,
      // per-document cross-entropy + perplexity. The oracle replays the
      // count model verbatim in SQL.
      val docs = t(s, dir, "documents")
      LmOps.ngramLmScore(docs, col("text"), docs, col("doc_id"),
          col("text"), n = 2, alpha = 0.4)
        .select(col("doc_id"), col("n_ngrams"),
          round(col("cross_entropy"), 4).as("cross_entropy"),
          round(col("ppl"), 2).as("ppl"))
        .orderBy("doc_id")
    }),
    // sf1-feasible value-exact twin (BASELINE.md "sf1 CORRECTNESS"):
    // the original's sequential first-fit walk is a recursive CTE with
    // one step per document — DuckDB-infeasible at sf1 (50k docs). A
    // deterministic 1/10 sample keeps every group and the identical
    // packing code path at replayable walk lengths (5k steps at sf1).
    "q_sx_seq_pack" -> ((s, dir) => {
      val bins = CorpusOps.packSequences(
          t(s, dir, "documents").filter(col("doc_id") % 10 === 0),
          col("source"), col("doc_id"), TextOps.tokenCount(col("text")),
          budget = 400L)
        .groupBy(col("grp"), col("bin"))
        .agg(sum(col("tok")).as("bin_tok"), count(lit(1)).as("bin_docs"))
      bins.groupBy(col("grp").as("source"))
        .agg(max(col("bin")).as("n_bins"),
          sum(col("bin_docs")).as("n_docs"),
          sum(col("bin_tok")).as("sum_tok"),
          max(col("bin_tok")).as("max_fill"),
          round(avg(col("bin_tok")), 4).as("avg_fill"))
        .orderBy("source")
    }),
    "q_seq_pack" -> ((s, dir) => {
      val bins = CorpusOps.packSequences(t(s, dir, "documents"),
          col("source"), col("doc_id"), TextOps.tokenCount(col("text")),
          budget = 400L)
        .groupBy(col("grp"), col("bin"))
        .agg(sum(col("tok")).as("bin_tok"), count(lit(1)).as("bin_docs"))
      bins.groupBy(col("grp").as("source"))
        .agg(max(col("bin")).as("n_bins"),
          sum(col("bin_docs")).as("n_docs"),
          sum(col("bin_tok")).as("sum_tok"),
          max(col("bin_tok")).as("max_fill"),
          round(avg(col("bin_tok")), 4).as("avg_fill"))
        .orderBy("source")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0
        |),
        |words AS (
        |  SELECT doc_id, u['pos'] - 1 AS pos, u['w'] AS w
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(t,
        |            (x, i) -> {'pos': i, 'w': x})) AS u
        |        FROM toks)
        |),
        |grams AS (
        |  SELECT doc_id, pos,
        |         w || ' ' || lead(w,1) OVER w2 || ' ' || lead(w,2) OVER w2
        |           || ' ' || lead(w,3) OVER w2 || ' ' || lead(w,4) OVER w2
        |           || ' ' || lead(w,5) OVER w2 || ' ' || lead(w,6) OVER w2
        |           || ' ' || lead(w,7) OVER w2 AS g
        |  FROM words
        |  WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(w,7) OVER w2 IS NOT NULL
        |),
        |hits AS (
        |  SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS cnt
        |  FROM grams
        |),
        |flagged AS (
        |  SELECT doc_id, pos,
        |         CASE WHEN lag(pos) OVER w IS NULL
        |                OR pos > lag(pos) OVER w + 8 THEN 1 ELSE 0
        |         END AS ns
        |  FROM hits WHERE cnt >= 2
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |),
        |spans AS (
        |  SELECT doc_id, pos,
        |         sum(ns) OVER (PARTITION BY doc_id ORDER BY pos)
        |           AS span_id
        |  FROM flagged
        |),
        |merged AS (
        |  SELECT doc_id, span_id, max(pos) - min(pos) + 8 AS span_len
        |  FROM spans GROUP BY doc_id, span_id
        |)
        |SELECT doc_id, count(*)::BIGINT AS n_spans,
        |       sum(span_len)::BIGINT AS dup_words,
        |       max(span_len)::BIGINT AS max_span_len
        |FROM merged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_para_dedup" ->
      """WITH pages0 AS (
        |  SELECT doc_id % 53 AS page_id, doc_id AS ord, text
        |  FROM documents
        |  UNION ALL
        |  SELECT (doc_id * 7 + 3) % 53, doc_id + 1000000, text
        |  FROM documents
        |),
        |pages AS (
        |  SELECT page_id,
        |         string_agg(text, e'\n\n' ORDER BY ord) AS ptext
        |  FROM pages0 GROUP BY page_id
        |),
        |paras AS (
        |  SELECT page_id, u['i'] - 1 AS idx, u['p'] AS para
        |  FROM (SELECT page_id,
        |          unnest(list_transform(
        |            regexp_split_to_array(ptext, '\n{2,}'),
        |            (x, i) -> {'i': i, 'p': x})) AS u
        |        FROM pages)
        |),
        |kept AS (
        |  SELECT page_id, idx, para,
        |         row_number() OVER (PARTITION BY md5(para)
        |                            ORDER BY page_id, idx) AS rk
        |  FROM paras
        |)
        |SELECT page_id, count(*)::BIGINT AS n_paras,
        |       count(*) FILTER (WHERE rk = 1)::BIGINT AS n_kept,
        |       md5(string_agg(para, e'\n\n' ORDER BY idx)
        |             FILTER (WHERE rk = 1)) AS rebuilt_md5
        |FROM kept GROUP BY page_id ORDER BY page_id""".stripMargin,
    "q_domain_mix" ->
      """WITH base AS (
        |  SELECT source, doc_id,
        |         len(regexp_split_to_array(trim(text), '\s+')) AS tok,
        |         md5(doc_id || ':s42') AS h,
        |         200 + 40 * CAST(substr(source, 4) AS INT) AS budget
        |  FROM documents
        |),
        |ranked AS (
        |  SELECT *, sum(tok) OVER (PARTITION BY source
        |                           ORDER BY h, doc_id) AS cum
        |  FROM base
        |)
        |SELECT source, count(*)::BIGINT AS n_sel,
        |       sum(tok)::BIGINT AS tok_sel,
        |       max(budget)::BIGINT AS budget,
        |       round(sum(tok) * 1.0 / max(budget), 4) AS util
        |FROM ranked WHERE cum - tok < budget
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_dup_span_removal" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0
        |),
        |words AS (
        |  SELECT doc_id, u['pos'] - 1 AS pos, u['w'] AS w
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(t,
        |            (x, i) -> {'pos': i, 'w': x})) AS u
        |        FROM toks)
        |),
        |grams AS (
        |  SELECT doc_id, pos,
        |         w || ' ' || lead(w,1) OVER w2 || ' ' || lead(w,2) OVER w2
        |           || ' ' || lead(w,3) OVER w2 || ' ' || lead(w,4) OVER w2
        |           || ' ' || lead(w,5) OVER w2 || ' ' || lead(w,6) OVER w2
        |           || ' ' || lead(w,7) OVER w2 AS g
        |  FROM words
        |  WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(w,7) OVER w2 IS NOT NULL
        |),
        |hits AS (
        |  SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS cnt
        |  FROM grams
        |),
        |flagged AS (
        |  SELECT doc_id, pos,
        |         CASE WHEN lag(pos) OVER w IS NULL
        |                OR pos > lag(pos) OVER w + 8 THEN 1 ELSE 0
        |         END AS ns
        |  FROM hits WHERE cnt >= 2
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |),
        |spans AS (
        |  SELECT doc_id, pos,
        |         sum(ns) OVER (PARTITION BY doc_id ORDER BY pos)
        |           AS span_id
        |  FROM flagged
        |),
        |merged AS (
        |  SELECT doc_id, span_id, min(pos) AS s, max(pos) + 7 AS e
        |  FROM spans GROUP BY doc_id, span_id
        |),
        |survivors AS (
        |  SELECT w.doc_id, w.pos, w.w
        |  FROM words w
        |  WHERE NOT EXISTS (SELECT 1 FROM merged m
        |    WHERE m.doc_id = w.doc_id AND w.pos BETWEEN m.s AND m.e)
        |),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS cleaned
        |  FROM survivors GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       md5(coalesce(r.cleaned, '')) AS clean_md5,
        |       length(coalesce(r.cleaned, ''))::BIGINT AS clean_len
        |FROM documents d LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q_lm_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents WHERE length(trim(text)) > 0
        |),
        |words AS (
        |  SELECT doc_id, u['pos'] - 1 AS pos, u['w'] AS w
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(t,
        |            (x, i) -> {'pos': i, 'w': x})) AS u
        |        FROM toks)
        |),
        |big AS (
        |  SELECT doc_id, pos, w AS w1,
        |         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |  FROM words
        |  QUALIFY w2 IS NOT NULL
        |),
        |cu AS (SELECT w, count(*) AS c FROM words GROUP BY 1),
        |cb AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY 1, 2),
        |v AS (SELECT count(*) AS v FROM cu)
        |SELECT b.doc_id,
        |       count(*) AS n_ngrams,
        |       round(avg(-ln((cb.c + 0.4) / (cu.c + 0.4 * v.v))), 4)
        |         AS cross_entropy,
        |       round(exp(avg(-ln((cb.c + 0.4) / (cu.c + 0.4 * v.v)))), 2)
        |         AS ppl
        |FROM big b
        |JOIN cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
        |JOIN cu ON cu.w = b.w1
        |CROSS JOIN v
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_seq_pack" -> seqPackOracle(""),
    "q_sx_seq_pack" -> seqPackOracle("WHERE doc_id % 10 = 0")
  )

  /** First-fit packing walk as ONE list fold per source (r13 verdict
    * ask #8): the recursive-CTE formulation paid one recursion step
    * per document (DuckDB-infeasible at sf1's 2,500-doc sources and
    * the reason q_seq_pack sat on the sf1 infeasible list); a
    * list_reduce over the per-source token list replays the identical
    * walk in one pass. The fold state is a single BIGINT —
    * (bin << 40) | (max_completed_fill << 20) | fill, fields < 2^20 —
    * because DuckDB 1.0's reduce leaks STRUCT accumulator state
    * across GROUP BY groups (observed: src12's walk picking up
    * another source's fill); packed-integer state does not. Bounds:
    * per-doc token counts and per-bin fills stay < 1,048,576 (budget
    * 400 + one max-sized doc), bins < 2^23 — far above any fixture. */
  private def seqPackOracle(filt: String): String =
    s"""WITH base AS (
       |  SELECT source, doc_id,
       |         len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS tok
       |  FROM documents $filt),
       |packed AS (
       |  SELECT source, count(*) AS n_docs, sum(tok) AS sum_tok,
       |    reduce(
       |      list_transform(list(tok ORDER BY doc_id),
       |        x -> (1::BIGINT << 40) + x),
       |      (acc, x) -> CASE WHEN (acc % 1048576) + (x % 1048576) > 400
       |        THEN (((acc >> 40) + 1) << 40)
       |             + (greatest((acc >> 20) % 1048576, acc % 1048576) << 20)
       |             + (x % 1048576)
       |        ELSE acc + (x % 1048576) END) AS st
       |  FROM base GROUP BY source)
       |SELECT source, (st >> 40)::BIGINT AS n_bins,
       |       n_docs::BIGINT AS n_docs,
       |       sum_tok::BIGINT AS sum_tok,
       |       greatest((st >> 20) % 1048576, st % 1048576)::BIGINT AS max_fill,
       |       round(sum_tok / (st >> 40), 4) AS avg_fill
       |FROM packed ORDER BY source""".stripMargin
}
