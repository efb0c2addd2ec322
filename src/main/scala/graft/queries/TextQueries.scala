package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps
import graft.sim.SimOps
import graft.text.TextOps

/** Driver-contract queries for the training-data-pipeline operators:
  * text analysis, deduplication, similarity search, multimodal plumbing.
  * Hash-based ops (minhash/simhash/LSH) are oracle-gated through exact
  * twins: the exact pair set is SQL-checkable and the hash path's
  * recall against it is deterministic (fixed seeds + data), asserted as
  * a literal boolean. Quality margins stay spec-bound in TextSimSpec. */
object TextQueries extends QueryPack {

  // q_incremental_ivf's per-application scratch roots, deleted at JVM
  // exit (r16 ADVICE) — idempotent per path
  private val tmpRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[queries] def registerTmpCleanup(root: String): Unit =
    if (tmpRoots.add(root))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles()
          if (kids != null) kids.foreach(rm)
          f.delete(): Unit
        }
        try rm(new java.io.File(root))
        catch { case _: Throwable => }
      }))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_redact_pii" -> ((s, dir) => {
      // documents carry no natural PII, so append deterministic
      // synthetic PII derived from doc_id — built with the identical
      // string expression in the oracle SQL, which makes the scrub
      // output itself cross-engine comparable (patterns are RE2-safe).
      import graft.text.RedactOps
      val aug = t(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .withColumn("aug", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or "),
          lit("https://ex.com/p/"), col("doc_id"),
          lit(" at 10.0.0."), pmod(col("doc_id"), lit(256)),
          lit(" call 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      aug.select(col("doc_id"),
          RedactOps.piiProfile(col("aug")).as("p"),
          md5(RedactOps.redactPii(col("aug"))).as("red_md5"))
        .select(col("doc_id"), col("p.n_emails"), col("p.n_urls"),
          col("p.n_ips"), col("p.n_phones"), col("red_md5"))
        .orderBy("doc_id")
    }),
    "q_lang_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("pred", TextOps.langId(col("text")))
        .groupBy(col("source"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("source", "pred")
    }),
    "q_contamination" -> ((s, dir) => {
      // docs 0-9 stand in for a benchmark suite; count 5-gram overlap
      // per source across the whole corpus (the bench docs themselves
      // stay in — fully-contaminated rows prove the screen catches
      // verbatim inclusion)
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") < 10)
      val hits = TextOps.ngramContamination(docs, col("doc_id"),
        col("text"), bench, col("text"), n = 5)
      docs.select(col("doc_id"), col("source"))
        .join(hits, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("n_hits")).as("n_contaminated"),
          sum(coalesce(col("n_hits"), lit(0L))).as("total_hits"))
        .orderBy("source")
    }),
    "q_clean_corpus" -> ((s, dir) => {
      // the end-to-end pretraining-data cleaning pipeline, one plan:
      // predicted-language filter → quality gate → exact dedup →
      // PII scrub → per-source survivor stats. Every stage is the
      // operator already oracle-checked in isolation; this query pins
      // their composition (filters push into one scan; dedup is the
      // only shuffle before the final agg).
      import graft.text.RedactOps
      val docs = t(s, dir, "documents")
      val gated = docs
        .filter(TextOps.langId(col("text")) === "en")
        .withColumn("q", TextOps.qualityFeatures(col("text")))
        .filter(col("q.quality") >= 0.5)
      TextOps.exactDedup(gated, col("text"), col("doc_id"))
        .select(col("source"), col("q.n_tokens").as("n_tokens"),
          length(RedactOps.redactPii(col("text"))).as("scrub_chars"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens"),
          sum(col("scrub_chars")).as("scrub_chars"))
        .orderBy("source")
    }),
    "q_text_quality" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("q", TextOps.qualityFeatures(col("text")))
        .groupBy(col("source"))
        .agg(
          sum(col("q.n_chars")).as("chars"),
          sum(col("q.n_tokens")).as("tokens"),
          round(avg(col("q.mean_word_len")), 6).as("avg_mwl"),
          round(avg(col("q.punct_ratio")), 6).as("avg_punct"),
          round(avg(col("q.quality")), 6).as("avg_quality"))
        .orderBy("source")
    }),
    "q_readability" -> ((s, dir) => {
      // integer word/syllable/sentence totals are exact cross-engine;
      // the per-doc ease/grade doubles are identical small-ratio
      // arithmetic in both engines, so 5-dp rounded averages are far
      // from any rounding lattice
      t(s, dir, "documents")
        .withColumn("r", TextOps.readability(col("text")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("r")).as("n_scored"),
          sum(col("r.n_words")).as("words"),
          sum(col("r.n_syllables")).as("syllables"),
          sum(col("r.n_sentences")).as("sentences"),
          round(avg(col("r.flesch_ease")), 5).as("avg_ease"),
          round(avg(col("r.fk_grade")), 5).as("avg_grade"))
        .orderBy("source")
    }),
    "q_compress_ratio" -> ((s, dir) => {
      // Compression-ratio quality signal. Exact deflate sizes are a
      // JVM-zlib implementation detail (spec-pinned in NativeExprSpec
      // against a direct Deflater call), so the oracle checks
      // mathematically guaranteed CONTRACT bounds on inputs both
      // engines construct bit-identically: a 400-char single-char run
      // must deflate below 0.2; 8 concatenated distinct md5 hexes
      // (256 chars of ~4-bit/char entropy) must stay above 0.35; the
      // run must compress better than the hex; real text of >= 50
      // bytes lands in (0, 1.5] (stored-block overhead bound); empty/
      // null text yields null.
      val docs = t(s, dir, "documents")
      val rep = TextOps.compressionRatio(
        repeat(chr(lit(97) + pmod(col("doc_id"), lit(26))), 400))
      val hex = TextOps.compressionRatio(
        concat((1 to 8).map(k => md5(concat(
          col("doc_id").cast("string"), lit(s":$k")))): _*))
      val real = TextOps.compressionRatio(col("text"))
      docs.select(col("source"), col("text"), rep.as("rr"),
          hex.as("hr"), real.as("tr"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rr") < 0.2, 1L).otherwise(0L)).as("n_rep_low"),
          sum(when(col("hr") > 0.35, 1L).otherwise(0L)).as("n_hex_high"),
          sum(when(col("rr") < col("hr"), 1L).otherwise(0L))
            .as("n_ordered"),
          sum(when(octet_length(col("text")) >= 50
              && col("tr") > 0.0 && col("tr") <= 1.5, 1L).otherwise(0L))
            .as("n_text_bounded"),
          sum(when(col("tr").isNull, 1L).otherwise(0L)).as("n_null_ratio"))
        .orderBy("source")
    }),
    "q_repetition" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sig = TextOps.repetitionSignals(docs, col("doc_id"),
        col("text"), 2)
      docs.select(col("doc_id"), col("source"))
        .join(sig, col("doc_id") === sig("doc"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(coalesce(col("dup_line_frac"), lit(0.0))), 6)
            .as("dup_line_frac"),
          round(avg(coalesce(col("dup_line_char_frac"), lit(0.0))), 6)
            .as("dup_line_char_frac"),
          round(avg(coalesce(col("top_ngram_frac"), lit(0.0))), 6)
            .as("top_ngram_frac"),
          round(avg(coalesce(col("dup_ngram_frac"), lit(0.0))), 6)
            .as("dup_ngram_frac"))
        .orderBy("source")
    }),
    "q_token_counts" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          sum(TextOps.tokenCount(col("text"))).as("ws_tokens"),
          sum(TextOps.tokenCountBpe(col("text"))).as("bpe_tokens"))
        .orderBy("source")
    }),
    "q_fingerprint_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(TextOps.fingerprint64(col("text"))).as("n_distinct"))
      val kept = TextOps.exactDedup(docs, col("text"), col("doc_id"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_after_dedup"))
      n.join(kept, Seq("source")).orderBy("source")
    }),
    "q_tfidf" -> ((s, dir) => {
      // rank on the rounded score (see tfIdfTopK) so cross-engine ulp
      // noise in ln can't flip the order
      TextOps.tfIdfTopK(t(s, dir, "documents")
            .filter(col("doc_id") < 40),
          col("doc_id"), col("text"), 3)
        .select(col("doc").as("doc_id"), col("rk").cast("long").as("rk"),
          col("term"), col("cnt"), round(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id", "rk")
    }),
    "q_jaccard_dup_pairs" -> ((s, dir) => {
      TextOps.jaccardDupPairs(t(s, dir, "documents"), col("doc_id"),
          col("text"), col("source"), 0.5)
        .groupBy(col("block").as("source"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg("jaccard"), 6).as("avg_jaccard"))
        .withColumnRenamed("block", "source")
        .orderBy("source")
    }),
    // hash-based dedup, oracle-gated via exact twins (the q_ann_lsh
    // pattern): the exact pair set and its aggregates are SQL-checkable;
    // the hash path's recall against it is a deterministic boolean
    // (fixed seeds + fixed data), asserted as a literal in the oracle.
    "q_minhash_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // exact 3-word-shingle jaccard pairs at the same threshold the
      // minhash estimates (tokenization mirrors minHashSignature,
      // including the <=3-words whole-text edge case). The twin runs
      // on a FIXED 500-doc base so its all-pairs-via-shingle join
      // costs the same at every scale factor — the minhash path under
      // test still scans the full corpus.
      val exact = TextOps.jaccardDupPairs(
          docs.filter(col("doc_id") < 500), col("doc_id"), col("text"),
          lit("all"), 0.6, shingleK = 3)
        .select(col("id1").as("i1"), col("id2").as("i2"),
          col("jaccard").as("jac"))
      val mh = TextOps.minHashDupPairs(docs, col("doc_id"), col("text"),
          0.6)
        .select(col("id1"), col("id2"), lit(1).as("hit"))
      exact.join(mh,
          exact("i1") === mh("id1") && exact("i2") === mh("id2"), "left")
        .agg(count(lit(1)).as("n_exact"),
          round(avg(col("jac")), 6).as("avg_exact_jaccard"),
          (count(col("hit")) >= count(lit(1)) * 0.9).as("recall_ok"))
    }),
    "q_simhash_dup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // exact side: identical normalized word sequences — such pairs
      // have IDENTICAL simhashes (hamming 0, every band matches), so
      // the banded candidate generator must find all of them: recall
      // is exactly 1 and the matched pairs' hamming is exactly 0,
      // whatever the hash function. Near-dup quality stays spec-bound
      // in TextSimSpec.
      val norm = docs.select(col("doc_id").as("d"),
        concat_ws(" ", split(lower(trim(col("text"))), "\\s+")).as("t"))
      val exact = norm.as("l").join(norm.as("r"),
          col("l.t") === col("r.t") && col("l.d") < col("r.d"))
        .select(col("l.d").as("i1"), col("r.d").as("i2"))
      // maxDist 16 over the 128-bit fingerprint ≈ the r13 query's 8
      // over 64 bits (each bit flips independently per hash, so
      // equivalent thresholds double with the width — r14 ADVICE)
      val sh = TextOps.simHashDupPairs(docs, col("doc_id"), col("text"),
          16)
        .select(col("id1"), col("id2"), col("hamming"))
      exact.join(sh,
          exact("i1") === sh("id1") && exact("i2") === sh("id2"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (count(col("hamming")) === count(lit(1))).as("recall_ok"),
          round(coalesce(avg(col("hamming")), lit(0.0)), 4)
            .as("avg_hamming"))
    }),
    "q_simhash_block" -> ((s, dir) => {
      // the r14 blocking-column variant: pairs must stay inside their
      // source block. Exact side: identical normalized word sequences
      // IN THE SAME SOURCE (hamming 0, every band + the block key
      // match) — recall must be exactly 1; and NO emitted pair may
      // cross sources (n_cross = 0 pins the blocking contract).
      val docs = t(s, dir, "documents")
      val norm = docs.select(col("doc_id").as("d"),
        col("source").as("src"),
        concat_ws(" ", split(lower(trim(col("text"))), "\\s+")).as("t"))
      val exact = norm.as("l").join(norm.as("r"),
          col("l.t") === col("r.t") && col("l.src") === col("r.src") &&
            col("l.d") < col("r.d"))
        .select(col("l.d").as("i1"), col("r.d").as("i2"))
      // maxDist 16 ≈ the 64-bit era's 8 (see q_simhash_dup)
      val sh = TextOps.simHashDupPairs(docs, col("doc_id"), col("text"),
          16, blocking = Some(col("source")))
        .select(col("id1"), col("id2"), col("hamming"))
      val cross = sh
        .join(norm.select(col("d").as("id1"), col("src").as("s1")), "id1")
        .join(norm.select(col("d").as("id2"), col("src").as("s2")), "id2")
        .agg(coalesce(sum(when(col("s1") =!= col("s2"), 1L)
          .otherwise(0L)), lit(0L)).as("n_cross"))
      exact.join(sh,
          exact("i1") === sh("id1") && exact("i2") === sh("id2"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (count(col("hamming")) === count(lit(1))).as("recall_ok"),
          round(coalesce(avg(col("hamming")), lit(0.0)), 4)
            .as("avg_hamming"))
        .crossJoin(cross)
    }),
    "q_incremental_simhash" -> ((s, dir) => {
      // daily-snapshot SimHash dedup loop (the q_incremental_dedup
      // pattern over the 128-bit fingerprint band table): even docs
      // are the persisted corpus, odd docs the new batch. The
      // deterministic fingerprint makes incremental ≡ full-batch an
      // exact equivalence — pinned as inc_equals_full — and
      // identical-text cross pairs (hamming 0, SQL-computable) must
      // all be found.
      import graft.text.TextOps
      val docs = t(s, dir, "documents")
      // fingerprint the corpus ONCE; old-only, full, and incremental
      // new-vs-old sweeps are slices of the same persisted band table
      val bandAll = TextOps.simHashBandTable(docs, col("doc_id"),
          col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bandOld = bandAll.filter(pmod(col("i"), lit(2)) === 0)
      val bandNew = bandAll.filter(pmod(col("i"), lit(2)) === 1)
      val incNew = TextOps.incrementalSimHashDupPairsFromBands(
        bandNew, bandOld, 8)
      val oldPairs = TextOps.simHashDupPairsFromBands(bandOld, 8)
      val full = TextOps.simHashDupPairsFromBands(bandAll, 8)
      val incAll = oldPairs.select("id1", "id2")
        .union(incNew.select("id1", "id2")).distinct()
      val eq = full.select(col("id1"), col("id2"), lit(1).as("f"))
        .join(incAll.withColumn("g", lit(1)), Seq("id1", "id2"),
          "full")
        .agg(coalesce(bool_and(col("f").isNotNull &&
          col("g").isNotNull), lit(true)).as("inc_equals_full"))
      val norm = docs.select(col("doc_id").as("d"),
        concat_ws(" ", split(lower(trim(col("text"))), "\\s+"))
          .as("t"))
      val ident = norm.as("l").join(norm.as("r"),
          col("l.t") === col("r.t") && col("l.d") < col("r.d") &&
            pmod(col("l.d"), lit(2)) =!= pmod(col("r.d"), lit(2)))
        .select(col("l.d").as("id1"), col("r.d").as("id2"))
      ident.join(incNew.select(col("id1"), col("id2"),
            lit(1).as("hit")), Seq("id1", "id2"), "left")
        .agg(count(lit(1)).as("n_ident_cross"),
          coalesce(bool_and(col("hit").isNotNull), lit(true))
            .as("ident_found"))
        .crossJoin(eq)
    }),
    "q_minhash_block" -> ((s, dir) => {
      // the r15 blocking-column variant of q_minhash_dup (verdict ask
      // #2 — blocking parity across the dedup family): pairs must stay
      // inside their source block. Exact side: identical normalized
      // word sequences IN THE SAME SOURCE — identical text ⟹ identical
      // minhash signature (est_jaccard 1, every band + the block key
      // match), so recall must be exactly 1; and NO emitted pair may
      // cross sources (n_cross = 0 pins the blocking contract).
      val docs = t(s, dir, "documents")
      val norm = docs.select(col("doc_id").as("d"),
        col("source").as("src"),
        concat_ws(" ", split(lower(trim(col("text"))), "\\s+")).as("t"))
      val exact = norm.as("l").join(norm.as("r"),
          col("l.t") === col("r.t") && col("l.src") === col("r.src") &&
            col("l.d") < col("r.d"))
        .select(col("l.d").as("i1"), col("r.d").as("i2"))
      val mh = TextOps.minHashDupPairs(docs, col("doc_id"), col("text"),
          0.6, blocking = Some(col("source")))
        .select(col("id1"), col("id2"), col("est_jaccard"))
      val cross = mh
        .join(norm.select(col("d").as("id1"), col("src").as("s1")), "id1")
        .join(norm.select(col("d").as("id2"), col("src").as("s2")), "id2")
        .agg(coalesce(sum(when(col("s1") =!= col("s2"), 1L)
          .otherwise(0L)), lit(0L)).as("n_cross"))
      exact.join(mh,
          exact("i1") === mh("id1") && exact("i2") === mh("id2"), "left")
        .agg(count(lit(1)).as("n_exact"),
          (count(col("est_jaccard")) === count(lit(1))).as("recall_ok"))
        .crossJoin(cross)
    }),
    "q_incremental_clusters" -> ((s, dir) => {
      // incremental CLUSTER maintenance (r15): clusters over persisted
      // forest state ∪ the incremental sweep's forest must equal
      // full-batch clusters exactly (docs/INCREMENTAL.md — forests
      // preserve per-subset connectivity; labels are component
      // minima). Even ids = corpus, odd = new batch, SimHash pairs at
      // maxDist 16. SQL anchor: identical-normalized-text docs whose
      // text occurs ≥2 times are provably clustered (hamming 0).
      import graft.graph.GraphOps
      import graft.text.TextOps
      val docs = t(s, dir, "documents")
      val bandAll = TextOps.simHashBandTable(docs, col("doc_id"),
          col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bandOld = bandAll.filter(pmod(col("i"), lit(2)) === 0)
      val bandNew = bandAll.filter(pmod(col("i"), lit(2)) === 1)
      val pairsOld = TextOps.simHashDupPairsFromBands(bandOld, 16)
      val pairsInc = TextOps.incrementalSimHashDupPairsFromBands(
        bandNew, bandOld, 16)
      val pairsFull = TextOps.simHashDupPairsFromBands(bandAll, 16)
      val forestState = GraphOps
        .localSpanningForest(pairsOld, col("id1"), col("id2"))
        .union(GraphOps
          .localSpanningForest(pairsInc, col("id1"), col("id2")))
      val inc = GraphOps.dupClustersFromEdges(forestState,
        col("u"), col("v"))
      val full = GraphOps.dupClusters(pairsFull, col("id1"), col("id2"))
      val eq = full.select(col("id"), col("component").as("fc"),
          col("csize").as("fs"))
        .join(inc.select(col("id"), col("component").as("ic"),
          col("csize").as("is")), Seq("id"), "full")
        .agg(coalesce(bool_and(col("fc") <=> col("ic") &&
          col("fs") <=> col("is")), lit(true)).as("inc_equals_full"))
      val norm = docs.select(col("doc_id").as("d"),
        concat_ws(" ", split(lower(trim(col("text"))), "\\s+")).as("t"))
      val identDocs = norm.withColumn("n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("t"))))
        .filter(col("n") >= 2)
        .select(col("d"))
      identDocs.join(full.select(col("id").as("d"),
            lit(1).as("hit")), Seq("d"), "left")
        .agg(count(lit(1)).as("n_ident_docs"),
          coalesce(bool_and(col("hit").isNotNull), lit(true))
            .as("ident_clustered"))
        .crossJoin(eq)
    }),
    "q_cosine_topk" -> ((s, dir) => {
      // cast to double so the dot product runs in f64 on both engines
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
      SimOps.cosineTopK(emb.filter(col("id") < 200), emb, 1)
        .select(col("qid"), col("cid"), round(col("cos"), 6).as("cos"))
        .orderBy("qid")
    }),
    "q_cosine_dup" -> ((s, dir) => {
      // the synthetic embeddings have no natural near-dups (max pair
      // cosine ≈ 0.5), so plant one perturbed twin per vector with the
      // SAME deterministic construction in the oracle SQL — the exact
      // pair set (≥ 0.95) is then precisely the planted twins, its
      // count/avg SQL-checkable, and LSH recall against it is a
      // deterministic boolean.
      // fixed 250-vector base so the exact twin costs the same 125k
      // pairs at every scale factor (the LSH path under test is the
      // scale path; the twin is the oracle contract)
      val emb = t(s, dir, "embeddings")
        .filter(col("vec_id") < 250)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
      val pert = emb.select((col("id") + 10000).as("id"),
        concat(array(element_at(col("vec"), 1) + lit(0.05)),
          slice(col("vec"), 2, 100000)).as("vec"))
      val all = emb.unionByName(pert)
      // exact twin via the fused broadcast threshold join (one corpus
      // pass, primitive-array dots) instead of an interpreted
      // higher-order-function crossJoin
      val exact = SimOps.cosineThresholdJoin(all, all, 0.95)
        .filter(col("qid") < col("cid"))
        .select(col("qid").as("i1"), col("cid").as("i2"), col("cos"))
      val lsh = SimOps.cosineDupPairs(all, 0.95)
        .select(col("id1"), col("id2"), lit(1).as("hit"))
      exact.join(lsh,
          exact("i1") === lsh("id1") && exact("i2") === lsh("id2"), "left")
        .agg(count(lit(1)).as("n_exact"),
          round(avg(col("cos")), 4).as("avg_cos"),
          (count(col("hit")) >= count(lit(1)) * 0.95).as("recall_ok"))
    }),
    "q_cosine_block" -> ((s, dir) => {
      // the r15 blocking-column variant of q_cosine_dup (dedup-family
      // parity): every base vector gets TWO planted twins — t1 at
      // id+10000 (even offset: same parity = same block under the
      // pmod(id,2) blocking key) and t2 at id+20001 (odd offset:
      // opposite parity = cross-block). The blocked LSH must find the
      // same-block exact pairs (recall contract) and emit ZERO
      // cross-block pairs (n_cross) even though t2's cosine clears
      // the threshold — the unblocked q_cosine_dup machinery would
      // emit it.
      val emb = t(s, dir, "embeddings")
        .filter(col("vec_id") < 250)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
      val t1 = emb.select((col("id") + 10000).as("id"),
        concat(array(element_at(col("vec"), 1) + lit(0.05)),
          slice(col("vec"), 2, 100000)).as("vec"))
      val t2 = emb.select((col("id") + 20001).as("id"),
        concat(array(element_at(col("vec"), 1)),
          array(element_at(col("vec"), 2) + lit(0.05)),
          slice(col("vec"), 3, 100000)).as("vec"))
      val all = emb.unionByName(t1).unionByName(t2)
      // exact same-block pair set (blocking semantics replayed on the
      // exact kernel): pairs with cos >= 0.95 AND equal parity
      val exact = SimOps.cosineThresholdJoin(all, all, 0.95)
        .filter(col("qid") < col("cid") &&
          pmod(col("qid"), lit(2)) === pmod(col("cid"), lit(2)))
        .select(col("qid").as("i1"), col("cid").as("i2"), col("cos"))
      val lsh = SimOps.cosineDupPairs(all, 0.95,
          blocking = Some(pmod(col("id"), lit(2))))
        .select(col("id1"), col("id2"), lit(1).as("hit"))
      val cross = lsh.agg(coalesce(sum(
          when(pmod(col("id1"), lit(2)) =!= pmod(col("id2"), lit(2)),
            1L).otherwise(0L)), lit(0L)).as("n_cross"))
      exact.join(lsh,
          exact("i1") === lsh("id1") && exact("i2") === lsh("id2"),
          "left")
        .agg(count(lit(1)).as("n_exact"),
          round(avg(col("cos")), 4).as("avg_cos"),
          (count(col("hit")) >= count(lit(1)) * 0.95).as("recall_ok"))
        .crossJoin(cross)
    }),
    // ANN queries: the hash-dependent candidates have no SQL twin, but
    // the exact-side aggregate AND the subset contract do — an ANN
    // result can never beat the exact top-1 (it searches a subset), so
    // `subset_ok` is deterministic whatever the hash luck, and catches
    // an ANN path whose similarity math drifts from the exact kernel.
    "q_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
      val sub = emb.filter(col("id") < 500)
      val exact = SimOps.cosineTopK(sub, sub, 1)
        .select(col("qid"), col("cos").as("ecos"))
      val ann = SimOps.lshCosineTopK(sub, 1)
        .select(col("qid"), col("cos").as("acos"))
      exact.join(ann, Seq("qid"), "left")
        .agg(count(lit(1)).as("n_queries"),
          round(avg(col("ecos")), 6).as("avg_exact_cos"),
          bool_and(coalesce(col("acos") <= col("ecos") + 1e-9,
            lit(true))).as("subset_ok"))
    }),
    "q_ann_pq" -> ((s, dir) => {
      // product-quantization ANN: deterministic per-subspace k-means
      // codebooks, ADC shortlist (refine·k), exact re-rank — so the
      // reported cos values are true cosines of a candidate subset
      // (subset_ok is a hard invariant) and recall vs the exact twin
      // is the measured contract (0.85-0.93 across sf0.001-0.1;
      // bound set at 0.75). The shortlist size scales ~sqrt(corpus):
      // a FIXED refine necessarily decays as distractors grow
      // (PqRecallProbe measured 0.91 -> 0.68 from 500 to 20k vectors
      // at refine=16; the sqrt rule holds ~0.9 at every probed sf) —
      // this is the knob a deployment grows with the corpus, pinned
      // here so the contract is scale-stable. At the oracle sf it
      // floors to the calibrated refine=16.
      import graft.sim.PqOps
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
      val sub = emb.filter(col("id") < 500)
      val nCorpus = emb.count()
      val refine = math.max(16,
        math.ceil(math.sqrt(nCorpus.toDouble) / 2).toInt)
      val cb = PqOps.trainPq(emb, m = 16, ksub = 32)
      val codes = PqOps.pqEncode(emb, cb)
      val exact = SimOps.cosineTopK(sub, emb, 1)
        .select(col("qid"), col("cos").as("ecos"))
      val ann = PqOps.pqCosineTopK(sub, codes, cb, 1, refine = refine,
          rerank = Some(emb))
        .select(col("qid"), col("cos").as("acos"))
      exact.join(ann, Seq("qid"), "left")
        .agg(count(lit(1)).as("n_queries"),
          round(avg(col("ecos")), 6).as("avg_exact_cos"),
          bool_and(coalesce(col("acos") <= col("ecos") + 1e-9,
            lit(true))).as("subset_ok"),
          coalesce(avg((col("acos") >= col("ecos") - 1e-9)
            .cast("int")) >= 0.75, lit(false)).as("recall_ok"))
    }),
    "q_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
      val sub = emb.filter(col("id") < 500)
      val exact = SimOps.cosineTopK(sub, emb, 1)
        .select(col("qid"), col("cos").as("ecos"))
      val ann = SimOps.ivfCosineTopK(sub, emb, 1)
        .select(col("qid"), col("cos").as("acos"))
      exact.join(ann, Seq("qid"), "left")
        .agg(count(lit(1)).as("n_queries"),
          round(avg(col("ecos")), 6).as("avg_exact_cos"),
          bool_and(coalesce(col("acos") <= col("ecos") + 1e-9,
            lit(true))).as("subset_ok"))
    }),
    "q_incremental_ivf" -> ((s, dir) => {
      // ANN state maintenance (r15): the daily-crawl append loop for
      // the cell-partitioned IVF corpus. Even ids are the persisted
      // corpus, odd ids the appended batch; centroids are frozen, so
      // append ≡ full-rewrite is an EXACT search equivalence (cell
      // assignment is a pure function of the persisted centroids) —
      // pinned as append_equals_rewrite. The SQL-checkable anchor is
      // the brute-force exact top-1 (the q_ann_ivf pattern) plus the
      // subset contract: an IVF cos can never exceed the exact cos.
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
      // path scoped per application: a fixed shared tmp dir let two
      // concurrent graft processes interleave the overwrite/append
      // sequence and corrupt each other's corpus (r15 ADVICE). The
      // per-app root is deleted at JVM exit (r16 ADVICE: the returned
      // frame lazily reads these parquet dirs, so deletion cannot
      // happen inside the query; without the hook every invocation
      // leaked a corpus+rewrite copy into java.io.tmpdir forever).
      val root = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q_inc_ivf_${s.sparkContext.applicationId}"
      TextQueries.registerTmpCleanup(root)
      val idx = SimOps.buildIvfIndex(emb)
      // the corpus (write-even + append-odd) and rewrite legs are
      // independent until compared — overlap them (guide §2.6); the
      // append stays strictly after its own corpus write
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fCorpus = Future {
        SimOps.writeIvfPartitioned(
          emb.filter(pmod(col("id"), lit(2)) === 0), idx, s"$root/corpus")
        SimOps.appendIvfPartitioned(
          emb.filter(pmod(col("id"), lit(2)) === 1), idx, s"$root/corpus")
      }
      val fRewrite = Future(
        SimOps.writeIvfPartitioned(emb, idx, s"$root/rewrite"))
      Await.result(fCorpus, Duration.Inf)
      Await.result(fRewrite, Duration.Inf)
      val q = emb.filter(col("id") < 500)
      val inc = SimOps.ivfCosineTopKIndexed(q, s"$root/corpus", idx, 1)
        .select(col("qid"), col("cid").as("icid"),
          col("cos").as("icos"))
      val rw = SimOps.ivfCosineTopKIndexed(q, s"$root/rewrite", idx, 1)
        .select(col("qid"), col("cid").as("rcid"),
          col("cos").as("rcos"))
      val exact = SimOps.cosineTopK(q, emb, 1)
        .select(col("qid"), col("cos").as("ecos"))
      exact.join(inc, Seq("qid"), "left").join(rw, Seq("qid"), "left")
        .agg(count(lit(1)).as("n_queries"),
          round(avg(col("ecos")), 6).as("avg_exact_cos"),
          coalesce(bool_and(col("icid") <=> col("rcid") &&
            col("icos") <=> col("rcos")), lit(true))
            .as("append_equals_rewrite"),
          bool_and(coalesce(col("icos") <= col("ecos") + 1e-9,
            lit(true))).as("subset_ok"))
    }),
    "q_multimodal_meta" -> ((s, dir) => {
      // payloads carry REAL container headers (PNG/JPEG/GIF/WebP) with
      // dimensions planted from doc_id arithmetic; sniffMeta must
      // recover format/width/height by actually parsing the headers,
      // and the oracle predicts every value from doc_id alone.
      val media = MultimodalOps.mediaTable(
        t(s, dir, "documents").withColumn("payload",
          MultimodalOps.syntheticPayload(col("doc_id"))),
        col("payload"), col("doc_id"))
        .join(t(s, dir, "documents").select(col("doc_id").as("media_id"),
          col("source")), Seq("media_id"))
      media.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("meta.n_bytes")).as("total_bytes"),
          count(when(col("meta.format") === "png", 1)).as("n_png"),
          count(when(col("meta.format") === "jpeg", 1)).as("n_jpeg"),
          count(when(col("meta.format") === "gif", 1)).as("n_gif"),
          count(when(col("meta.format") === "webp", 1)).as("n_webp"),
          sum(col("meta.width")).as("sum_w"),
          sum(col("meta.height")).as("sum_h"))
        .orderBy("source")
    }),
    "q_multimodal_decode" -> ((s, dir) => {
      // REAL pixel decode end-to-end: deterministic 24-bit BMPs built
      // from doc_id, decoded through the JDK's ImageIO raster, resized
      // nearest-neighbor and re-decoded after a lossless PNG
      // round-trip; plus PCM-16 WAV chunk-walk stats. The oracle
      // recomputes every statistic from doc_id arithmetic alone — a
      // wrong byte anywhere in the BMP writer, the decoder, the
      // resampler or the PNG round-trip shifts a mean and fails it.
      val m = t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("img", MultimodalOps.syntheticBmp(col("doc_id")))
        .withColumn("st", MultimodalOps.decodeImage(col("img")))
        .withColumn("rs", MultimodalOps.decodeImage(
          MultimodalOps.resizeImage(col("img"), 4, 4)))
        .withColumn("wv", MultimodalOps.wavFeatures(
          MultimodalOps.syntheticWav(col("doc_id"))))
      m.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("st.width") * col("st.height")).as("n_px"),
          round(avg(col("st.mean_r")), 6).as("avg_r"),
          round(avg(col("st.mean_g")), 6).as("avg_g"),
          round(avg(col("st.mean_b")), 6).as("avg_b"),
          round(avg(col("rs.mean_r")), 6).as("avg_r4"),
          sum(col("wv.n_samples")).as("n_samples"),
          round(avg(col("wv.rms")), 6).as("avg_rms"))
        .orderBy("source")
    }),
    "q_audio_frames" -> ((s, dir) => {
      // frame-level PCM features (RMS / zero-crossings / peak) over
      // 32-sample windows of the synthetic PCM-16 WAVs; the oracle
      // recomputes every frame from the sample formula
      // s(j) = (id·7 + j·3) % 2001 − 1000.
      val m = t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("af", MultimodalOps.audioFrames(
          MultimodalOps.syntheticWav(col("doc_id")), 32))
        .select(col("source"), col("doc_id"), explode(col("af")).as("f"))
      m.groupBy(col("source"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("f.n")).as("n_samples"),
          round(avg(col("f.rms")), 6).as("avg_rms"),
          sum(col("f.zcr")).as("zcr_sum"),
          sum(col("f.peak")).as("peak_sum"))
        .orderBy("source")
    }),
    "q_warc_extract" -> ((s, dir) => {
      // WARC crawl-source parse: real ISO-28500 framing (header block
      // + Content-Length body + HTTP response parse + HTML text
      // strip), every extracted field recomputed by the oracle from
      // doc_id arithmetic.
      import graft.sources.WarcOps
      t(s, dir, "documents")
        .filter(col("doc_id") < 5000)
        .select(col("doc_id"), explode(WarcOps.warcRecords(
          WarcOps.syntheticWarc(col("doc_id")))).as("r"))
        .select(col("doc_id"), col("r.*"))
        .filter(col("warc_type") === "response")
        .groupBy((col("doc_id") % 50).as("host"))
        .agg(count(lit(1)).as("n_pages"),
          count(when(col("http_status") === 200, 1)).as("n_ok"),
          sum(length(col("text"))).as("text_len"),
          sum(size(split(col("text"), " "))).as("n_tokens"))
        .orderBy("host")
    }),
    "q_script_detect" -> ((s, dir) => {
      // writing-script routing: planted Latin/Cyrillic/Han mixes with
      // the deterministic (count desc, name asc) tie-break — the
      // oracle recomputes the winner and ratio from id arithmetic.
      import graft.text.ScriptOps
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("p", ScriptOps.scriptProfile(
          ScriptOps.syntheticScriptText(col("doc_id"))))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          count(when(col("p.script") === "LATIN", 1)).as("n_latin"),
          count(when(col("p.script") === "CYRILLIC", 1)).as("n_cyrillic"),
          count(when(col("p.script") === "HAN", 1)).as("n_han"),
          sum(col("p.n_letters")).as("letters_sum"),
          round(avg(col("p.ratio")), 6).as("avg_ratio"))
        .orderBy("source")
    }),
    "q_sitemap" -> ((s, dir) => {
      // sitemap discovery parse: locs (incl. entity-decoded queries),
      // optional lastmod/priority fields — counts and priority sums
      // recomputed from id arithmetic.
      import graft.sources.SitemapOps
      t(s, dir, "documents")
        .filter(col("doc_id") < 4000)
        .select(col("doc_id"), col("source"),
          explode(SitemapOps.sitemapUrls(
            SitemapOps.syntheticSitemap(col("doc_id")))).as("u"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_urls"),
          count(col("u.lastmod")).as("n_lastmod"),
          count(when(col("u.priority") >= 0, 1)).as("n_priority"),
          round(sum(when(col("u.priority") >= 0, col("u.priority"))
            .otherwise(0.0)), 6).as("priority_sum"),
          count(when(col("u.loc").contains("&"), 1)).as("n_entity_locs"))
        .orderBy("source")
    }),
    "q_robots" -> ((s, dir) => {
      // RFC 9309 robots matching: group selection (a graftbot-specific
      // group REPLACES the * group when present), longest-match
      // Allow/Disallow precedence, crawl-delay and sitemap parsing —
      // the whole truth table closed-form in doc_id arithmetic.
      import graft.sources.RobotsOps
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("r", RobotsOps.syntheticRobots(col("doc_id")))
      val agent = "graftbot"
      d.select(col("source"),
          RobotsOps.robotsAllowed(col("r"),
            concat(lit("/page"), (col("doc_id") % 9).cast("string")),
            agent).cast("int").as("page_ok"),
          RobotsOps.robotsAllowed(col("r"),
            concat(lit("/private"), (col("doc_id") % 5).cast("string"),
              lit("/doc")), agent).cast("int").as("priv_ok"),
          RobotsOps.robotsAllowed(col("r"),
            concat(lit("/private"), (col("doc_id") % 5).cast("string"),
              lit("/pub/x")), agent).cast("int").as("pub_ok"),
          RobotsOps.robotsMeta(col("r"), agent).as("m"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("page_ok")).as("n_page_ok"),
          sum(col("priv_ok")).as("n_priv_ok"),
          sum(col("pub_ok")).as("n_pub_ok"),
          sum(col("m.crawl_delay")).cast("long").as("delay_sum"),
          sum(col("m.n_sitemaps")).as("n_sitemaps"))
        .orderBy("source")
    }),
    "q_boilerplate" -> ((s, dir) => {
      // jusText-style boilerplate removal: synthetic pages plant a
      // nav bar, k content paragraphs, a too-short teaser, and a
      // link-farm footer; only the paragraphs survive, and the oracle
      // recomputes the surviving text's length/tokens from id
      // arithmetic.
      import graft.text.BoilerplateOps
      t(s, dir, "documents").filter(col("doc_id") < 4000)
        .select(col("source"), BoilerplateOps.extractContent(
          BoilerplateOps.syntheticHtml(col("doc_id"))).as("c"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("c"))).as("content_len"),
          sum(size(split(col("c"), "[\\s\\n]+"))).as("n_tokens"))
        .orderBy("source")
    }),
    "q_bpe_tokens" -> ((s, dir) => {
      // real BPE encoding under a frozen merge list (training itself
      // is spec-gated on the textbook corpus — BpeSpec). The merge
      // pass is one non-overlapping left-to-right sweep per merge,
      // which the oracle replays EXACTLY as chained REPLACEs over
      // single-char placeholder symbols.
      import graft.text.BpeOps
      val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
        "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")
      t(s, dir, "documents").filter(col("doc_id") < 4000)
        .select(col("source"),
          BpeOps.bpeEncode(col("text"), merges).as("toks"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("toks"))).as("n_tokens"),
          sum(expr("size(filter(toks, t -> length(t) > 1))"))
            .as("n_merged"))
        .orderBy("source")
    }),
    "q_unigram_tokens" -> ((s, dir) => {
      // real Viterbi unigram-LM encoding under a frozen vocabulary
      // (training is spec-gated — UnigramSpec pins the EM lattice
      // against brute-force enumeration). The frozen pieces use 12
      // pairwise-distinct letters, so no two piece occurrences can
      // ever overlap (cross-piece: disjoint alphabets; self: a
      // 2-char piece overlapping itself would need its first char to
      // equal its last) — and each piece (one token, ln 0.2) strictly
      // beats its two singles (ln 0.01 each), so the Viterbi optimum
      // provably uses EVERY occurrence: tokens per word = len − occ.
      // That makes the segmentation exactly replayable in SQL by
      // counting occurrences per piece.
      import graft.text.UnigramOps
      val pieces = Seq("th", "an", "re", "is", "ol", "um")
      val vocab =
        ('a' to 'z').map(c => c.toString -> math.log(0.01)).toMap ++
          pieces.map(_ -> math.log(0.2)).toMap
      t(s, dir, "documents").filter(col("doc_id") < 4000)
        .select(col("source"),
          UnigramOps.unigramEncode(col("text"), vocab).as("toks"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("toks"))).as("n_tokens"),
          sum(expr("size(filter(toks, t -> length(t) > 1))"))
            .as("n_pieces"))
        .orderBy("source")
    }),
    "q_pdf_extract" -> ((s, dir) => {
      // PDF text extraction: real one-page PDFs (valid xref/trailer,
      // alternating plain and FlateDecode content streams) built from
      // doc_id; the oracle recomputes the extracted text's length and
      // token count from the planted line arithmetic.
      import graft.sources.PdfOps
      // pdfSummary: one synthesis + one file walk per row (text and
      // meta as a single struct)
      t(s, dir, "documents")
        .filter(col("doc_id") < 4000)
        .select(col("doc_id"), PdfOps.pdfSummary(
          PdfOps.syntheticPdf(col("doc_id"))).as("ps"))
        .select(col("doc_id"), col("ps.text").as("t"),
          col("ps.meta").as("m"))
        .groupBy((col("doc_id") % 40).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("m.n_pages")).as("n_pages"),
          sum(length(col("t"))).as("text_len"),
          sum(size(split(col("t"), "[\\s\\n]+"))).as("n_tokens"))
        .orderBy("bucket")
    }),
    "q_pdf_cid" -> ((s, dir) => {
      // composite-font (Type0/Identity-H) PDFs: text is hex-string
      // 2-byte CIDs that only a real /ToUnicode CMap walk can decode
      // (CID = char + 0x0100 via bfrange, '#' via bfchar) — plus a
      // plain-font line in the same page, so Tf font switching and
      // both string syntaxes are all load-bearing. Oracle recomputes
      // the decoded text's length and tokens from id arithmetic.
      import graft.sources.PdfOps
      t(s, dir, "documents")
        .filter(col("doc_id") < 4000)
        .select(col("doc_id"),
          PdfOps.pdfText(PdfOps.syntheticPdfCid(col("doc_id"))).as("t"))
        .groupBy((col("doc_id") % 40).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("t"))).as("text_len"),
          sum(size(split(col("t"), "[\\s\\n]+"))).as("n_tokens"),
          sum(when(col("t").contains("\ufffd"), 1L).otherwise(0L))
            .as("n_unmapped"))
        .orderBy("bucket")
    }),
    "q_pdf_objstm" -> ((s, dir) => {
      // PDF 1.5 ObjStm layout (catalog + page tree packed in a
      // compressed object stream, real xref STREAM, no classic xref
      // table — the modern writer layout): text must extract
      // identically to the classic-layout twin, and the page count
      // (1 + id%3 pages, visible ONLY inside the inflated ObjStm)
      // must match id arithmetic.
      import graft.sources.PdfOps
      t(s, dir, "documents")
        .filter(col("doc_id") < 4000)
        .select(col("doc_id"), PdfOps.pdfSummary(
          PdfOps.syntheticPdfObjStm(col("doc_id"))).as("ps"))
        .select(col("doc_id"), col("ps.text").as("t"),
          col("ps.meta").as("m"))
        .groupBy((col("doc_id") % 40).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("m.n_pages")).as("n_pages"),
          sum(when(col("m.version") === "1.5", 1L).otherwise(0L))
            .as("n_v15"),
          sum(length(col("t"))).as("text_len"),
          sum(size(split(col("t"), "[\\s\\n]+"))).as("n_tokens"))
        .orderBy("bucket")
    }),
    "q_pdf_encrypted" -> ((s, dir) => {
      // encrypted PDFs (standard security handler, empty user
      // password): even ids RC4-128 (V2/R3), odd ids AES-128-CBC
      // (V4/R4 AESV2), content Flate'd when id%3==1. The engine must
      // verify /U, derive per-object keys, decrypt, THEN inflate —
      // the oracle pins the decrypted text against the same planted
      // line arithmetic as q_pdf_extract plus the cipher split.
      import graft.sources.PdfOps
      t(s, dir, "documents")
        .filter(col("doc_id") < 4000)
        .select(col("doc_id"), PdfOps.pdfCryptoText(
          PdfOps.syntheticPdfEncrypted(col("doc_id"))).as("c"))
        .groupBy((col("doc_id") % 40).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("c.cipher") === "rc4", 1L).otherwise(0L))
            .as("n_rc4"),
          sum(when(col("c.cipher") === "aes128", 1L).otherwise(0L))
            .as("n_aes"),
          sum(when(col("c.decryptable"), 1L).otherwise(0L)).as("n_open"),
          sum(length(col("c.text"))).as("text_len"),
          sum(size(split(col("c.text"), "[\\s\\n]+"))).as("n_tokens"))
        .orderBy("bucket")
    }),
    "q_pdf_aes256" -> ((s, dir) => {
      // PDF-2.0-era encryption: id%3==0 AES-256 V5/R6 (Algorithm 2.B
      // hash), id%3==1 AES-256 V5/R5 (legacy single SHA-256), id%3==2
      // AES-128 V4/R4 with /EncryptMetadata false (0xFFFFFFFF key
      // salt). All open under the empty user password; decrypted text
      // pins the same planted-line arithmetic as q_pdf_encrypted.
      import graft.sources.PdfOps
      t(s, dir, "documents")
        .filter(col("doc_id") < 4000)
        .select(col("doc_id"), PdfOps.pdfCryptoText(
          PdfOps.syntheticPdfAes256(col("doc_id"))).as("c"))
        .groupBy((col("doc_id") % 40).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("c.cipher") === "aes256", 1L).otherwise(0L))
            .as("n_aes256"),
          sum(when(col("c.cipher") === "aes128", 1L).otherwise(0L))
            .as("n_aes128"),
          sum(when(col("c.decryptable"), 1L).otherwise(0L)).as("n_open"),
          sum(length(col("c.text"))).as("text_len"),
          sum(size(split(col("c.text"), "[\\s\\n]+"))).as("n_tokens"))
        .orderBy("bucket")
    }),
    "q_warc_gz" -> ((s, dir) => {
      // Common-Crawl layout: one gzip member per record; the reader
      // auto-detects the magic and inflates the member sequence, so
      // the same id-arithmetic oracle covers the compressed twin.
      import graft.sources.WarcOps
      // r17: the r16 spread before the gzip synthesize+inflate was
      // removed — the record set is capped (doc_id < 4000) so the work
      // is fixed at every sf, and the sf10 fires-branch A/B measured
      // the spread a consistent ~50% loss (0.37-0.48 s off vs
      // 0.58-0.71 s on): pure exchange overhead over capped work.
      t(s, dir, "documents").filter(col("doc_id") < 4000)
        .select(col("doc_id"))
        .select(col("doc_id"), explode(WarcOps.warcRecords(
          WarcOps.syntheticWarcGz(col("doc_id")))).as("r"))
        .select(col("doc_id"), col("r.*"))
        .filter(col("warc_type") === "response")
        .groupBy((col("doc_id") % 50).as("host"))
        .agg(count(lit(1)).as("n_pages"),
          count(when(col("http_status") === 200, 1)).as("n_ok"),
          sum(length(col("text"))).as("text_len"),
          sum(size(split(col("text"), " "))).as("n_tokens"))
        .orderBy("host")
    }),
    "q_image_dhash" -> ((s, dir) => {
      // perceptual image hash over REAL decoded rasters: payloads are
      // valid BMPs keyed by page = doc_id % 311, and the oracle
      // recomputes every dHash bit (luma, 9x8 nearest-neighbor
      // resample, gradient signs) from page arithmetic in SQL.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 311).as("page"))
        .withColumn("ph", MultimodalOps.dHash64(
          MultimodalOps.syntheticBmp(col("page"))))
      docs.groupBy(col("page"))
        .agg(count(lit(1)).as("n_variants"),
          countDistinct(col("ph")).as("n_hashes"),
          min(shiftrightunsigned(col("ph"), 32)).as("hash_hi"),
          min(col("ph").bitwiseAND(lit(0xffffffffL))).as("hash_lo"))
        .orderBy("page")
    }),
    "q_quality_classifier" -> ((s, dir) => {
      // fastText-style quality filter: hashed bag-of-words features
      // (md5-prefix buckets — the oracle replays every bucket count in
      // SQL) + distributed IRLS logistic on a SQL-checkable label
      // (n_chars > 300). Feature sums and n anchor the featurization;
      // the near-zero ridge-MLE score equations gate the training.
      import graft.text.ClassifierOps
      import graft.ops.LinRegOps
      val dim = 13
      val docs = t(s, dir, "documents").select(col("doc_id"),
        col("text"), (col("n_chars") > 300).cast("double").as("yb"))
      val beta = ClassifierOps.trainQualityClassifier(docs,
        col("doc_id"), col("text"), col("yb"), dim)
      val feats = ClassifierOps.hashedFeatures(docs, col("doc_id"),
        col("text"), dim)
      feats.withColumn("mu", LinRegOps.logisticPredict(
          (0 until dim).map(i => col(s"f$i")), beta))
        .agg(count(lit(1)).as("n"),
          round(sum(col("yb")), 1).as("sum_y"),
          sum(col("n_tok")).as("tok_sum"),
          round(sum(col("f0")), 6).as("f0_sum"),
          round(sum(col("f5")), 6).as("f5_sum"),
          round(sum(col("f11")), 6).as("f11_sum"),
          (round(sum(col("mu") - col("yb")), 3) + 0.0).as("score_bias"),
          (round(sum(col("f3") * (col("mu") - col("yb"))), 3) + 0.0)
            .as("score_f3"))
    }),
    "q_image_phash" -> ((s, dir) => {
      // DCT perceptual hash over the same real decoded rasters: the
      // oracle replays the 32x32 luma resample, both fixed-point DCT
      // passes (the 8x32 integer basis table is embedded as VALUES
      // from the SAME Scala array), the AC-median threshold, and every
      // hash bit — all in SQL integer arithmetic.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 311).as("page"))
        .withColumn("ph", MultimodalOps.pHash64(
          MultimodalOps.syntheticBmp(col("page"))))
      docs.groupBy(col("page"))
        .agg(count(lit(1)).as("n_variants"),
          countDistinct(col("ph")).as("n_hashes"),
          min(shiftrightunsigned(col("ph"), 32)).as("hash_hi"),
          min(col("ph").bitwiseAND(lit(0xffffffffL))).as("hash_lo"))
        .orderBy("page")
    }),
    "q_image_dup_pairs" -> ((s, dir) => {
      // banded Hamming dup join over the perceptual hashes; the
      // oracle rebuilds the expected pair set from the SQL-computed
      // hashes themselves, so even a cross-page hash collision would
      // be predicted identically on both sides.
      // spread BEFORE the payload projection: the BMP synthesis is the
      // expensive per-row step and must land post-shuffle (r16)
      val sub = graft.util.Spread.byKey(
          t(s, dir, "documents").filter(col("doc_id") < 3000)
            .select(col("doc_id")), col("doc_id"))
        .select(col("doc_id"), MultimodalOps.syntheticBmp(
          col("doc_id") % 311).as("payload"))
      MultimodalOps.imageDupPairs(sub, col("doc_id"), col("payload"), 0)
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("id1") + col("id2")).as("pair_id_sum"))
    }),
    "q_image_block" -> ((s, dir) => {
      // the r15 blocking-column variant of q_image_dup_pairs (verdict
      // ask #2): near-dup pairs must stay inside their block. The
      // page period (97) and the block key ((doc_id/97) % 2) are
      // coprime-free by construction: same-page docs alternate blocks
      // (doc_id steps of 97 flip the quotient parity), so BOTH
      // same-block pairs (step 194) and cross-block pairs (step 97)
      // exist — n_cross = 0 is a live assertion, not vacuous. Oracle
      // rebuilds the expected pair set from the SQL-computed hashes.
      val sub = graft.util.Spread.byKey(
          t(s, dir, "documents").filter(col("doc_id") < 3000)
            .select(col("doc_id")), col("doc_id"))
        .select(col("doc_id"),
          pmod(floor(col("doc_id") / 97), lit(2)).as("shard"),
          MultimodalOps.syntheticBmp(col("doc_id") % 97).as("payload"))
      val pairs = MultimodalOps.imageDupPairs(sub, col("doc_id"),
        col("payload"), 0, blocking = Some(col("shard")))
      val sh = sub.select(col("doc_id"), col("shard"))
      val cross = pairs
        .join(sh.select(col("doc_id").as("id1"), col("shard").as("s1")),
          "id1")
        .join(sh.select(col("doc_id").as("id2"), col("shard").as("s2")),
          "id2")
        .agg(coalesce(sum(when(col("s1") =!= col("s2"), 1L)
          .otherwise(0L)), lit(0L)).as("n_cross"))
      pairs.agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("id1") + col("id2")), lit(0L))
            .as("pair_id_sum"))
        .crossJoin(cross)
    }),
    "q_incremental_image" -> ((s, dir) => {
      // daily-crawl incremental image dedup (r15 verdict ask #3 — the
      // q_incremental_simhash pattern over the MIH band table): even
      // ids are the persisted corpus, odd ids the new batch. maxDist=2
      // exercises the 1-bit probe expansion on the NEW side only. The
      // deterministic dHash makes incremental ≡ full-batch an exact
      // equivalence — pinned as inc_equals_full — and identical-hash
      // cross pairs (SQL-computable) must all be found.
      val sub = graft.util.Spread.byKey(
          t(s, dir, "documents").filter(col("doc_id") < 3000)
            .select(col("doc_id")), col("doc_id"))
        .select(col("doc_id"), MultimodalOps.syntheticBmp(
          col("doc_id") % 311).as("payload"))
      val bandAll = MultimodalOps.imageBandTable(sub, col("doc_id"),
          col("payload"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bandOld = bandAll.filter(pmod(col("i"), lit(2)) === 0)
      val bandNew = bandAll.filter(pmod(col("i"), lit(2)) === 1)
      val incNew = MultimodalOps.incrementalImageDupPairsFromBands(
        bandNew, bandOld, 2)
      val oldPairs = MultimodalOps.imageDupPairsFromBands(bandOld, 2)
      val full = MultimodalOps.imageDupPairsFromBands(bandAll, 2)
      val incAll = oldPairs.select("id1", "id2")
        .union(incNew.select("id1", "id2")).distinct()
      val eq = full.select(col("id1"), col("id2"), lit(1).as("f"))
        .join(incAll.withColumn("g", lit(1)), Seq("id1", "id2"), "full")
        .agg(coalesce(bool_and(col("f").isNotNull &&
          col("g").isNotNull), lit(true)).as("inc_equals_full"))
      // identical-hash cross-parity pairs from the band-0 slice (one
      // row per image — no re-decode)
      val ph0 = bandAll.filter(col("b") === 0)
        .select(col("i").as("d"), col("ph"))
      val ident = ph0.as("l").join(ph0.as("r"),
          col("l.ph") === col("r.ph") && col("l.d") < col("r.d") &&
            pmod(col("l.d"), lit(2)) =!= pmod(col("r.d"), lit(2)))
        .select(col("l.d").as("id1"), col("r.d").as("id2"))
      ident.join(incNew.select(col("id1"), col("id2"),
            lit(1).as("hit")), Seq("id1", "id2"), "left")
        .agg(count(lit(1)).as("n_ident_cross"),
          coalesce(bool_and(col("hit").isNotNull), lit(true))
            .as("ident_found"))
        .crossJoin(eq)
    }),
    "q_image_clusters" -> ((s, dir) => {
      // cross-modal composition: perceptual-hash pairs feed the same
      // star-contraction connected-components engine the text dedup
      // uses; oracle rebuilds clusters as hash-equality groups (exact
      // at maxDist=0, including any cross-page hash collision).
      val sub = graft.util.Spread.byKey(
          t(s, dir, "documents").filter(col("doc_id") < 3000)
            .select(col("doc_id")), col("doc_id"))
        .select(col("doc_id"), MultimodalOps.syntheticBmp(
          col("doc_id") % 311).as("payload"))
      val pairs = MultimodalOps.imageDupPairs(sub, col("doc_id"),
        col("payload"), 0)
      graft.graph.GraphOps.dupClusters(pairs, col("id1"), col("id2"))
        .agg(count(lit(1)).as("n_clustered"),
          countDistinct(col("component")).as("n_clusters"),
          sum(col("component")).as("comp_sum"),
          sum(col("csize")).as("csize_sum"))
    }),
    "q_url_dedup" -> ((s, dir) => {
      // URL canonicalization as a crawl-dedup key: raw URLs vary by
      // scheme case / www / default port / trailing slash / tracking
      // params / param order / fragment, all planted from doc_id; the
      // canonical form (and so the dedup survivors) depends only on
      // page = doc_id % 1000, which the oracle reconstructs directly.
      import graft.text.UrlOps
      UrlOps.urlDedup(
          t(s, dir, "documents").select(col("doc_id"),
            UrlOps.syntheticUrl(col("doc_id")).as("url")),
          col("doc_id"), col("url"))
        .orderBy("canonical_url")
    }),
    "q_webp_decode" -> ((s, dir) => {
      // REAL WebP-lossless pixel decode: payloads are genuine VP8L
      // bitstreams (from-scratch encoder, options rotating by doc_id
      // across subtract-green / predictors / color cache / LZ77 /
      // cross-color), decoded by the from-scratch VP8L decoder. The
      // oracle recomputes the per-channel pixel means from doc_id
      // arithmetic — any mis-decoded bit anywhere shifts a mean.
      val m = t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("st", MultimodalOps.decodeImage(
          MultimodalOps.syntheticWebp(col("doc_id"))))
      m.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          count(col("st")).as("n_decoded"),
          sum(col("st.width") * col("st.height")).as("n_px"),
          round(avg(col("st.mean_r")), 6).as("avg_r"),
          round(avg(col("st.mean_g")), 6).as("avg_g"),
          round(avg(col("st.mean_b")), 6).as("avg_b"))
        .orderBy("source")
    }),
    "q_webp_lossy" -> ((s, dir) => {
      // The DOCUMENTED lossy-WebP boundary as an oracle-gated
      // contract (MultimodalOps object doc): VP8 key-frame headers
      // are genuinely parsed (uncompressed prefix — dims must match
      // the id arithmetic), while pixel decode of the header-only
      // fixtures explicitly routes to null (n_decoded must be 0,
      // never a silently-wrong raster).
      //
      // Conditional pixel branch (r11 verdict ask #7): when RFC 6386
      // tables are injected (graft.vp8TablesPath), a SECOND payload
      // column carries complete coefficient bitstreams from the Vp8
      // round-trip encoder, and pixels_ok asserts exact flat-color
      // recovery of every one. Without tables the branch is skipped —
      // pixels_ok is vacuously true, so the oracle stays constant.
      val m0 = t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("payload",
          MultimodalOps.syntheticWebpLossyHeader(col("doc_id")))
        .withColumn("meta", MultimodalOps.sniffMeta(col("payload")))
        .withColumn("st", MultimodalOps.decodeImage(col("payload")))
      val m = graft.multimodal.Vp8Tables.loaded match {
        case None => m0.withColumn("px_ok", lit(true))
        case Some(tables) =>
          val (yStep, _) = graft.multimodal.Vp8.flatLattice(tables, 0)
          val expY = lit(128) + (pmod(col("doc_id"), lit(9)) - 4) * yStep
          m0.withColumn("full",
              MultimodalOps.syntheticWebpLossy(col("doc_id")))
            .withColumn("st2", MultimodalOps.decodeImage(col("full")))
            // flat frame ⟹ every luma pixel equals the encoded value
            // exactly ⟹ the gray mean reproduces it to fp accuracy
            .withColumn("px_ok", col("st2").isNotNull &&
              col("st2.width") === col("meta.width") &&
              col("st2.height") === col("meta.height") &&
              abs((col("st2.mean_r") * 299 + col("st2.mean_g") * 587 +
                col("st2.mean_b") * 114) / 1000.0 -
                expY.cast("double")) < 1.5)
      }
      m.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          count(col("meta")).as("n_meta"),
          sum(when(col("meta.format") === "webp", 1L).otherwise(0L))
            .as("n_webp"),
          sum(col("meta.width").cast("long") * col("meta.height"))
            .as("n_px"),
          count(col("st")).as("n_decoded"),
          coalesce(bool_and(col("px_ok")), lit(false)).as("pixels_ok"))
        .orderBy("source")
    }),
    "q_video_frames" -> ((s, dir) => {
      // REAL video-container decode: payloads are valid AVIs (hdrl +
      // movi + idx1) with uncompressed 24-bit DIB frames; frame
      // pixel means, keyframe flags and the evenly-spaced keyframe
      // sampling are all recomputed by the oracle from doc_id
      // arithmetic.
      import graft.multimodal.AviOps
      // videoSummary = ONE container walk + ONE decode pass per row
      // (meta / all frames / sampled keyframes as one struct) — the
      // single-facet functions would re-parse the payload per column
      val m = t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("vs", AviOps.videoSummary(
          AviOps.syntheticAvi(col("doc_id")), 2))
        .select(col("doc_id"), col("source"), col("vs.meta").as("meta"),
          col("vs.frames").as("fs"), col("vs.sampled").as("sk"))
      m.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("meta.n_frames")).as("n_frames"),
          sum(col("meta.n_keyframes")).as("n_keyframes"),
          round(avg(expr(
            "aggregate(fs, 0D, (a, x) -> a + x.mean_r) / size(fs)")), 6)
            .as("avg_r"),
          round(avg(expr(
            "aggregate(fs, 0D, (a, x) -> a + x.mean_g) / size(fs)")), 6)
            .as("avg_g"),
          round(avg(expr(
            "aggregate(fs, 0D, (a, x) -> a + x.mean_b) / size(fs)")), 6)
            .as("avg_b"),
          sum(expr("aggregate(sk, 0L, (a, x) -> a + x.frame_idx)"))
            .as("sampled_idx_sum"),
          sum(size(col("sk"))).as("n_sampled"))
        .orderBy("source")
    })
  )

  /** dHash64 replay CTE chain (pages → dims → grays → bits → hv),
    * parameterized by the synthetic-BMP page period: hv holds one
    * (page, hh, hl) row per distinct page among doc_id < 3000 —
    * exactly [[graft.multimodal.MultimodalOps.dHash64]] over
    * `syntheticBmp(doc_id % pageMod)`, spelled out in SQL integer
    * arithmetic (shared by the q_image_* oracles). */
  private def dHashCte(pageMod: Int): String =
    s"""pages AS (
       |  SELECT DISTINCT doc_id % $pageMod AS page FROM documents
       |  WHERE doc_id < 3000),
       |dims AS (
       |  SELECT page, (8 + page % 9) w, (8 + (page * 3) % 9) h
       |  FROM pages),
       |grays AS (
       |  SELECT d.page, gx.x, gy.y,
       |    (299 * ((d.page*31 + ((gx.x*d.w)//9)*7 + ((gy.y*d.h)//8)*13) % 256)
       |   + 587 * ((d.page*17 + ((gx.x*d.w)//9)*11 + ((gy.y*d.h)//8)*3) % 256)
       |   + 114 * ((d.page*5 + ((gx.x*d.w)//9)*3 + ((gy.y*d.h)//8)*29) % 256))
       |      // 1000 AS g
       |  FROM dims d, range(0, 9) gx(x), range(0, 8) gy(y)),
       |bits AS (
       |  SELECT a.page, a.y * 8 + a.x AS k
       |  FROM grays a JOIN grays b
       |    ON b.page = a.page AND b.y = a.y AND b.x = a.x + 1
       |  WHERE a.x < 8 AND b.g > a.g),
       |hv AS (
       |  SELECT p.page,
       |    COALESCE(SUM(CASE WHEN k >= 32 THEN (1::BIGINT << (k - 32)) END), 0) hh,
       |    COALESCE(SUM(CASE WHEN k < 32 THEN (1::BIGINT << k) END), 0) hl
       |  FROM pages p LEFT JOIN bits b ON b.page = p.page
       |  GROUP BY 1)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_redact_pii" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or ' ||
        |    'https://ex.com/p/' || doc_id || ' at 10.0.0.' ||
        |    (doc_id % 256) || ' call 555-' ||
        |    lpad((doc_id % 10000)::VARCHAR, 4, '0') AS aug
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  len(regexp_extract_all(aug,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(aug, 'https?://[^\s]+')) AS n_urls,
        |  len(regexp_extract_all(aug,
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips,
        |  len(regexp_extract_all(aug,
        |    '(?:\+[0-9]{1,3}[-. ])?\b(?:[0-9]{2,4}[-. ])?[0-9]{3,4}[-. ][0-9]{4}\b')) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(aug,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '[EMAIL]', 'g'),
        |    'https?://[^\s]+', '[URL]', 'g'),
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g'),
        |    '(?:\+[0-9]{1,3}[-. ])?\b(?:[0-9]{2,4}[-. ])?[0-9]{3,4}[-. ][0-9]{4}\b',
        |    '[PHONE]', 'g') ) AS red_md5
        |FROM aug ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH l AS (
        |  SELECT doc_id, TRIM(u.l) AS line
        |  FROM documents, UNNEST(string_split(text, chr(10))) AS u(l)
        |  WHERE LENGTH(TRIM(u.l)) > 0),
        |lc AS (SELECT doc_id, line, COUNT(*) c FROM l GROUP BY 1, 2),
        |ls AS (
        |  SELECT doc_id, SUM(c) n_lines, COUNT(*) nd,
        |    SUM(c * LENGTH(line)) ca,
        |    SUM(CASE WHEN c > 1 THEN c * LENGTH(line) ELSE 0 END) cd
        |  FROM lc GROUP BY 1),
        |tk AS (SELECT doc_id,
        |    regexp_split_to_array(LOWER(TRIM(text)), '\s+') t
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, t[s.i] || ' ' || t[s.i + 1] AS g
        |  FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
        |  WHERE len(t) >= 2),
        |nc AS (SELECT doc_id, g, COUNT(*) c FROM ng GROUP BY 1, 2),
        |ns AS (
        |  SELECT doc_id, SUM(c) n_ng, MAX(c) max_c,
        |    SUM(CASE WHEN c > 1 THEN c ELSE 0 END) dup_c
        |  FROM nc GROUP BY 1),
        |sig AS (
        |  SELECT d.doc_id, d.source,
        |    COALESCE((ls.n_lines - ls.nd)::DOUBLE / ls.n_lines, 0.0) dlf,
        |    COALESCE(ls.cd::DOUBLE / ls.ca, 0.0) dlcf,
        |    COALESCE(ns.max_c::DOUBLE / ns.n_ng, 0.0) tnf,
        |    COALESCE(ns.dup_c::DOUBLE / ns.n_ng, 0.0) dnf
        |  FROM documents d
        |  LEFT JOIN ls ON d.doc_id = ls.doc_id
        |  LEFT JOIN ns ON d.doc_id = ns.doc_id)
        |SELECT source, COUNT(*)::BIGINT AS n_docs,
        |  ROUND(AVG(dlf), 6) AS dup_line_frac,
        |  ROUND(AVG(dlcf), 6) AS dup_line_char_frac,
        |  ROUND(AVG(tnf), 6) AS top_ngram_frac,
        |  ROUND(AVG(dnf), 6) AS dup_ngram_frac
        |FROM sig GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_lang_id" -> {
      // identical stopword scoring, literal replace both sides
      def score(lang: String): String =
        TextOps.langProfiles(lang).map(w =>
          s"(LENGTH(p) - LENGTH(REPLACE(p, '$w', ''))) / ${w.length}.0")
          .mkString(" + ")
      s"""WITH t AS (
         |  SELECT source, ' ' || LOWER(text) || ' ' AS p, text
         |  FROM documents),
         |sc AS (
         |  SELECT source,
         |    ${score("de")} AS s_de,
         |    ${score("en")} AS s_en,
         |    ${score("es")} AS s_es,
         |    ${score("fr")} AS s_fr,
         |    LENGTH(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))
         |      AS cjk
         |  FROM t),
         |p AS (
         |  SELECT source,
         |    CASE WHEN cjk > 0 THEN 'zh'
         |      WHEN s_de >= GREATEST(s_en, s_es, s_fr) THEN 'de'
         |      WHEN s_en >= GREATEST(s_es, s_fr) THEN 'en'
         |      WHEN s_es >= s_fr THEN 'es'
         |      ELSE 'fr' END AS pred
         |  FROM sc)
         |SELECT source, pred, COUNT(*) AS n
         |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "q_contamination" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(LOWER(TRIM(text)), '\s+') t
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id,
        |    t[s.i] || ' ' || t[s.i+1] || ' ' || t[s.i+2] || ' ' ||
        |    t[s.i+3] || ' ' || t[s.i+4] AS g
        |  FROM tk, UNNEST(generate_series(1, len(t) - 4)) AS s(i)
        |  WHERE len(t) >= 5),
        |bg AS (SELECT DISTINCT g FROM ng WHERE doc_id < 10),
        |h AS (
        |  SELECT doc_id, COUNT(DISTINCT g) n_hits
        |  FROM ng JOIN bg USING (g) GROUP BY 1)
        |SELECT d.source, COUNT(*) AS n_docs,
        |  COUNT(h.n_hits) AS n_contaminated,
        |  SUM(COALESCE(h.n_hits, 0))::BIGINT AS total_hits
        |FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_clean_corpus" -> {
      def score(lang: String): String =
        TextOps.langProfiles(lang).map(w =>
          s"(LENGTH(p) - LENGTH(REPLACE(p, '$w', ''))) / ${w.length}.0")
          .mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, source, text, ' ' || LOWER(text) || ' ' AS p
         |  FROM documents),
         |sc AS (
         |  SELECT doc_id, source, text,
         |    ${score("de")} AS s_de,
         |    ${score("en")} AS s_en,
         |    ${score("es")} AS s_es,
         |    ${score("fr")} AS s_fr,
         |    LENGTH(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))
         |      AS cjk
         |  FROM t),
         |en AS (
         |  SELECT doc_id, source, text FROM sc
         |  WHERE cjk = 0 AND NOT s_de >= GREATEST(s_en, s_es, s_fr)
         |    AND s_en >= GREATEST(s_es, s_fr)),
         |q AS (
         |  SELECT doc_id, source, text,
         |    LENGTH(regexp_split_to_array(TRIM(text), '\\s+'))::BIGINT nt
         |  FROM (
         |    SELECT *, LENGTH(text)::DOUBLE nc,
         |      LENGTH(regexp_split_to_array(TRIM(text), '\\s+'))::DOUBLE ntd,
         |      LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE np,
         |      LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE nd
         |    FROM en)
         |  WHERE (CASE WHEN ntd < 5 THEN 0.0 ELSE
         |    LEAST(1.0, GREATEST(0.0,
         |      1.0 - ABS((nc - ntd + 1.0) / ntd - 5.0)/10.0
         |        - np/nc*2.0 - nd/nc*2.0)) END) >= 0.5),
         |d AS (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY LOWER(TRIM(regexp_replace(text, '\\s+', ' ',
         |      'g'))) ORDER BY doc_id) rn
         |  FROM q)
         |SELECT source, COUNT(*) AS n_docs, SUM(nt)::BIGINT AS tokens,
         |  SUM(LENGTH(regexp_replace(regexp_replace(regexp_replace(
         |    regexp_replace(text,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
         |      '[EMAIL]', 'g'),
         |    'https?://[^\\s]+', '[URL]', 'g'),
         |    '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '[IP]', 'g'),
         |    '(?:\\+[0-9]{1,3}[-. ])?\\b(?:[0-9]{2,4}[-. ])?[0-9]{3,4}[-. ][0-9]{4}\\b',
         |    '[PHONE]', 'g')))::BIGINT AS scrub_chars
         |FROM d WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q_readability" ->
      """WITH d AS (
        |  SELECT source, text,
        |    regexp_extract_all(
        |      regexp_replace(lower(text), '[^a-z]+', ' ', 'g'),
        |      '[a-z]+') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |    LENGTH(toks) AS nw,
        |    list_sum(list_transform(toks, w ->
        |      GREATEST(1, LENGTH(regexp_extract_all(w, '[aeiouy]+')))))
        |      AS syl,
        |    GREATEST(1, LENGTH(regexp_extract_all(text, '[.!?]+')))
        |      AS ns
        |  FROM d),
        |f AS (
        |  SELECT source, nw, syl, ns,
        |    nw::DOUBLE / ns::DOUBLE AS wps,
        |    syl::DOUBLE / nw::DOUBLE AS spw
        |  FROM m WHERE nw > 0),
        |agg AS (
        |  SELECT source, COUNT(*) AS n_scored, SUM(nw) AS words,
        |    SUM(syl) AS syllables, SUM(ns) AS sentences,
        |    ROUND(AVG(206.835 - 1.015 * wps - 84.6 * spw), 5)
        |      AS avg_ease,
        |    ROUND(AVG(0.39 * wps + 11.8 * spw - 15.59), 5) AS avg_grade
        |  FROM f GROUP BY 1),
        |nd AS (SELECT source, COUNT(*) AS n_docs FROM m GROUP BY 1)
        |SELECT n.source, n.n_docs::BIGINT AS n_docs,
        |  COALESCE(a.n_scored, 0)::BIGINT AS n_scored,
        |  a.words::BIGINT AS words, a.syllables::BIGINT AS syllables,
        |  a.sentences::BIGINT AS sentences, a.avg_ease, a.avg_grade
        |FROM nd n LEFT JOIN agg a ON a.source = n.source
        |ORDER BY 1""".stripMargin,
    "q_compress_ratio" ->
      // contract bounds are certainties of DEFLATE itself, so the
      // oracle states them as arithmetic over the same row set
      """SELECT source, COUNT(*)::BIGINT AS n_docs,
        |  COUNT(*)::BIGINT AS n_rep_low,
        |  COUNT(*)::BIGINT AS n_hex_high,
        |  COUNT(*)::BIGINT AS n_ordered,
        |  COUNT(*) FILTER (WHERE STRLEN(text) >= 50)::BIGINT
        |    AS n_text_bounded,
        |  COUNT(*) FILTER (WHERE text IS NULL OR LENGTH(text) = 0)
        |    ::BIGINT AS n_null_ratio
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_text_quality" ->
      """WITH q AS (
        |  SELECT source,
        |    LENGTH(text)::DOUBLE nc,
        |    LENGTH(regexp_split_to_array(TRIM(text), '\s+'))::DOUBLE nt,
        |    LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE np,
        |    LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE nd
        |  FROM documents),
        |f AS (
        |  SELECT source, nc, nt,
        |    (nc - nt + 1.0) / nt AS mwl,
        |    np / nc AS punct, nd / nc AS digit
        |  FROM q)
        |SELECT source,
        |  SUM(nc)::BIGINT AS chars, SUM(nt)::BIGINT AS tokens,
        |  ROUND(AVG(mwl), 6) AS avg_mwl,
        |  ROUND(AVG(punct), 6) AS avg_punct,
        |  ROUND(AVG(CASE WHEN nt < 5 THEN 0.0 ELSE
        |    LEAST(1.0, GREATEST(0.0,
        |      1.0 - ABS(mwl - 5.0)/10.0 - punct*2.0 - digit*2.0))
        |    END), 6) AS avg_quality
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_token_counts" ->
      """SELECT source,
        |  SUM(LENGTH(regexp_split_to_array(TRIM(text), '\s+')))::BIGINT
        |    AS ws_tokens,
        |  SUM(list_sum(list_transform(
        |    regexp_split_to_array(LOWER(TRIM(text)), '\s+'),
        |    w -> GREATEST(CEIL(LENGTH(w) / 4.0)::BIGINT, 1))))::BIGINT
        |    AS bpe_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_fingerprint_dedup" ->
      """WITH n AS (
        |  SELECT source, COUNT(*) n_docs,
        |    COUNT(DISTINCT LOWER(TRIM(regexp_replace(text, '\s+', ' ',
        |      'g')))) n_distinct
        |  FROM documents GROUP BY 1),
        |k AS (
        |  SELECT source, COUNT(*) n_after_dedup
        |  FROM (
        |    SELECT source, ROW_NUMBER() OVER (
        |      PARTITION BY LOWER(TRIM(regexp_replace(text, '\s+', ' ',
        |        'g'))) ORDER BY doc_id) rn
        |    FROM documents)
        |  WHERE rn = 1 GROUP BY 1)
        |SELECT source, n_docs, n_distinct, n_after_dedup
        |FROM n JOIN k USING (source) ORDER BY 1""".stripMargin,
    "q_tfidf" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
        |w AS (
        |  SELECT doc_id, UNNEST(regexp_split_to_array(
        |    LOWER(TRIM(text)), '\s+')) term
        |  FROM d),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) cnt FROM w
        |  WHERE LENGTH(term) > 0 GROUP BY 1, 2),
        |dl AS (SELECT doc_id, SUM(cnt) dlen FROM tf GROUP BY 1),
        |dfq AS (SELECT term, COUNT(*) dfc FROM tf GROUP BY 1),
        |nd AS (SELECT COUNT(DISTINCT doc_id) n FROM tf),
        |sc AS (
        |  SELECT tf.doc_id, tf.term, tf.cnt,
        |    tf.cnt::DOUBLE / dl.dlen
        |      * (LN((nd.n + 1.0) / (dfq.dfc + 1.0)) + 1.0) tfidf
        |  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term), nd),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY ROUND(tfidf, 6) DESC, term) rk
        |  FROM sc)
        |SELECT doc_id, rk, term, cnt, ROUND(tfidf, 6) AS tfidf
        |FROM rk WHERE rk <= 3 ORDER BY 1, 2""".stripMargin,
    "q_jaccard_dup_pairs" ->
      """WITH w AS (
        |  SELECT DISTINCT source b, doc_id i, UNNEST(
        |    regexp_split_to_array(LOWER(TRIM(text)), '\s+')) w
        |  FROM documents),
        |nw AS (SELECT b, i, COUNT(*) n FROM w GROUP BY 1, 2),
        |pairs AS (
        |  SELECT l.b, l.i i1, r.i i2, COUNT(*) common
        |  FROM w l JOIN w r ON l.b = r.b AND l.w = r.w AND l.i < r.i
        |  GROUP BY 1, 2, 3),
        |j AS (
        |  SELECT p.b, p.common::DOUBLE
        |      / (n1.n + n2.n - p.common) AS jac
        |  FROM pairs p
        |  JOIN nw n1 ON n1.b = p.b AND n1.i = p.i1
        |  JOIN nw n2 ON n2.b = p.b AND n2.i = p.i2
        |  WHERE p.common::DOUBLE / (n1.n + n2.n - p.common) >= 0.5)
        |SELECT b AS source, COUNT(*) AS n_pairs,
        |  ROUND(AVG(jac), 6) AS avg_jaccard
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_minhash_dup" ->
      """WITH tk AS (
        |  SELECT doc_id d, regexp_split_to_array(LOWER(TRIM(text)),
        |    '\s+') t
        |  FROM documents WHERE doc_id < 500),
        |sh AS (
        |  SELECT DISTINCT d,
        |    CASE WHEN len(t) <= 3 THEN array_to_string(t, ' ')
        |      ELSE t[s.i] || ' ' || t[s.i+1] || ' ' || t[s.i+2] END g
        |  FROM tk, UNNEST(generate_series(1, GREATEST(len(t) - 2, 1)))
        |    AS s(i)),
        |ns AS (SELECT d, COUNT(*) n FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT l.d i1, r.d i2, COUNT(*) common
        |  FROM sh l JOIN sh r ON l.g = r.g AND l.d < r.d GROUP BY 1, 2),
        |j AS (
        |  SELECT p.common::DOUBLE / (n1.n + n2.n - p.common) jac
        |  FROM pairs p
        |  JOIN ns n1 ON n1.d = p.i1 JOIN ns n2 ON n2.d = p.i2
        |  WHERE p.common::DOUBLE / (n1.n + n2.n - p.common) >= 0.6)
        |SELECT COUNT(*)::BIGINT AS n_exact,
        |  ROUND(AVG(jac), 6) AS avg_exact_jaccard,
        |  true AS recall_ok
        |FROM j""".stripMargin,
    "q_simhash_dup" ->
      """WITH n AS (
        |  SELECT doc_id d, array_to_string(regexp_split_to_array(
        |    LOWER(TRIM(text)), '\s+'), ' ') t
        |  FROM documents)
        |SELECT COUNT(*)::BIGINT AS n_exact, true AS recall_ok,
        |  0.0 AS avg_hamming
        |FROM n l JOIN n r ON l.t = r.t AND l.d < r.d""".stripMargin,
    "q_incremental_simhash" ->
      """WITH n AS (
        |  SELECT doc_id AS d,
        |    array_to_string(regexp_split_to_array(lower(trim(text)),
        |      '\s+'), ' ') AS t
        |  FROM documents)
        |SELECT
        |  (SELECT COUNT(*) FROM n l JOIN n r
        |     ON l.t = r.t AND l.d < r.d AND l.d % 2 <> r.d % 2
        |  )::BIGINT AS n_ident_cross,
        |  true AS ident_found,
        |  true AS inc_equals_full""".stripMargin,
    "q_incremental_clusters" ->
      """WITH n AS (
        |  SELECT doc_id AS d,
        |    array_to_string(regexp_split_to_array(lower(trim(text)),
        |      '\s+'), ' ') AS t
        |  FROM documents),
        |g AS (SELECT t FROM n GROUP BY t HAVING COUNT(*) >= 2)
        |SELECT (SELECT COUNT(*) FROM n JOIN g USING (t))::BIGINT
        |    AS n_ident_docs,
        |  true AS ident_clustered,
        |  true AS inc_equals_full""".stripMargin,
    "q_simhash_block" ->
      """WITH n AS (
        |  SELECT doc_id d, source src, array_to_string(
        |    regexp_split_to_array(LOWER(TRIM(text)), '\s+'), ' ') t
        |  FROM documents)
        |SELECT COUNT(*)::BIGINT AS n_exact, true AS recall_ok,
        |  0.0 AS avg_hamming, 0::BIGINT AS n_cross
        |FROM n l JOIN n r ON l.t = r.t AND l.src = r.src
        |  AND l.d < r.d""".stripMargin,
    "q_minhash_block" ->
      """WITH n AS (
        |  SELECT doc_id d, source src, array_to_string(
        |    regexp_split_to_array(LOWER(TRIM(text)), '\s+'), ' ') t
        |  FROM documents)
        |SELECT COUNT(*)::BIGINT AS n_exact, true AS recall_ok,
        |  0::BIGINT AS n_cross
        |FROM n l JOIN n r ON l.t = r.t AND l.src = r.src
        |  AND l.d < r.d""".stripMargin,
    "q_cosine_dup" ->
      """WITH e AS (
        |  SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings
        |  WHERE vec_id < 250),
        |p AS (
        |  SELECT id + 10000 id, list_concat([v[1] + 0.05], v[2:]) v
        |  FROM e),
        |u AS (SELECT * FROM e UNION ALL SELECT * FROM p),
        |j AS (
        |  SELECT list_cosine_similarity(l.v, r.v) c
        |  FROM u l JOIN u r ON l.id < r.id
        |  WHERE list_cosine_similarity(l.v, r.v) >= 0.95)
        |SELECT COUNT(*)::BIGINT AS n_exact, ROUND(AVG(c), 4) AS avg_cos,
        |  true AS recall_ok
        |FROM j""".stripMargin,
    "q_cosine_block" ->
      """WITH e AS (
        |  SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings
        |  WHERE vec_id < 250),
        |p1 AS (
        |  SELECT id + 10000 id, list_concat([v[1] + 0.05], v[2:]) v
        |  FROM e),
        |p2 AS (
        |  SELECT id + 20001 id,
        |    list_concat([v[1], v[2] + 0.05], v[3:]) v
        |  FROM e),
        |u AS (SELECT * FROM e UNION ALL SELECT * FROM p1
        |      UNION ALL SELECT * FROM p2),
        |j AS (
        |  SELECT list_cosine_similarity(l.v, r.v) c
        |  FROM u l JOIN u r ON l.id < r.id AND l.id % 2 = r.id % 2
        |  WHERE list_cosine_similarity(l.v, r.v) >= 0.95)
        |SELECT COUNT(*)::BIGINT AS n_exact, ROUND(AVG(c), 4) AS avg_cos,
        |  true AS recall_ok, 0::BIGINT AS n_cross
        |FROM j""".stripMargin,
    "q_ann_lsh" ->
      """WITH e AS (
        |  SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings
        |  WHERE vec_id < 500),
        |s AS (
        |  SELECT q.id qid, list_cosine_similarity(q.v, c.v) cos,
        |    ROW_NUMBER() OVER (PARTITION BY q.id
        |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.id) rk
        |  FROM e q JOIN e c ON q.id <> c.id)
        |SELECT COUNT(*) AS n_queries,
        |  ROUND(AVG(cos), 6) AS avg_exact_cos,
        |  true AS subset_ok
        |FROM s WHERE rk = 1""".stripMargin,
    "q_ann_pq" ->
      """WITH q AS (
        |  SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings
        |  WHERE vec_id < 500),
        |c AS (SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings),
        |s AS (
        |  SELECT q.id qid, list_cosine_similarity(q.v, c.v) cos,
        |    ROW_NUMBER() OVER (PARTITION BY q.id
        |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.id) rk
        |  FROM q JOIN c ON q.id <> c.id)
        |SELECT COUNT(*) AS n_queries,
        |  ROUND(AVG(cos), 6) AS avg_exact_cos,
        |  true AS subset_ok, true AS recall_ok
        |FROM s WHERE rk = 1""".stripMargin,
    "q_ann_ivf" ->
      """WITH q AS (
        |  SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings
        |  WHERE vec_id < 500),
        |c AS (SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings),
        |s AS (
        |  SELECT q.id qid, list_cosine_similarity(q.v, c.v) cos,
        |    ROW_NUMBER() OVER (PARTITION BY q.id
        |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.id) rk
        |  FROM q JOIN c ON q.id <> c.id)
        |SELECT COUNT(*) AS n_queries,
        |  ROUND(AVG(cos), 6) AS avg_exact_cos,
        |  true AS subset_ok
        |FROM s WHERE rk = 1""".stripMargin,
    "q_incremental_ivf" ->
      """WITH q AS (
        |  SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings
        |  WHERE vec_id < 500),
        |c AS (SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings),
        |s AS (
        |  SELECT q.id qid, list_cosine_similarity(q.v, c.v) cos,
        |    ROW_NUMBER() OVER (PARTITION BY q.id
        |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.id) rk
        |  FROM q JOIN c ON q.id <> c.id)
        |SELECT COUNT(*) AS n_queries,
        |  ROUND(AVG(cos), 6) AS avg_exact_cos,
        |  true AS append_equals_rewrite,
        |  true AS subset_ok
        |FROM s WHERE rk = 1""".stripMargin,
    "q_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings
        |  WHERE vec_id < 200),
        |c AS (SELECT vec_id id, embedding::DOUBLE[] v FROM embeddings),
        |s AS (
        |  SELECT q.id qid, c.id cid,
        |    list_cosine_similarity(q.v, c.v) cos,
        |    ROW_NUMBER() OVER (PARTITION BY q.id
        |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.id) rk
        |  FROM q JOIN c ON q.id <> c.id)
        |SELECT qid, cid, ROUND(cos, 6) AS cos
        |FROM s WHERE rk = 1 ORDER BY qid""".stripMargin,
    "q_multimodal_meta" ->
      """WITH m AS (
        |  SELECT source, doc_id id, doc_id % 4 f,
        |    16 + doc_id % 512 w, 16 + (doc_id * 7) % 512 h,
        |    doc_id % 64 pad
        |  FROM documents)
        |SELECT source, COUNT(*) AS n,
        |  SUM(CASE f WHEN 0 THEN 29 WHEN 1 THEN 17 WHEN 2 THEN 13
        |    ELSE 30 END + pad)::BIGINT AS total_bytes,
        |  COUNT(CASE WHEN f = 0 THEN 1 END) AS n_png,
        |  COUNT(CASE WHEN f = 1 THEN 1 END) AS n_jpeg,
        |  COUNT(CASE WHEN f = 2 THEN 1 END) AS n_gif,
        |  COUNT(CASE WHEN f = 3 THEN 1 END) AS n_webp,
        |  SUM(w)::BIGINT AS sum_w, SUM(h)::BIGINT AS sum_h
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_multimodal_decode" ->
      """WITH ids AS (
        |  SELECT source, doc_id id, (8 + doc_id % 9) w,
        |    (8 + (doc_id * 3) % 9) h, (64 + doc_id % 64) ns
        |  FROM documents),
        |imgs AS (
        |  SELECT i.source, i.id, i.w, i.h,
        |    AVG((i.id * 31 + x.x * 7 + y.y * 13) % 256) mr,
        |    AVG((i.id * 17 + x.x * 11 + y.y * 3) % 256) mg,
        |    AVG((i.id * 5 + x.x * 3 + y.y * 29) % 256) mb
        |  FROM ids i, range(0, 17) x(x), range(0, 17) y(y)
        |  WHERE x.x < i.w AND y.y < i.h
        |  GROUP BY 1, 2, 3, 4),
        |-- nearest-neighbor 4x4 resample: src pixel = (x*w//4, y*h//4)
        |rs AS (
        |  SELECT i.source, i.id,
        |    AVG((i.id * 31 + ((x.x * i.w) // 4) * 7
        |      + ((y.y * i.h) // 4) * 13) % 256) mr4
        |  FROM ids i, range(0, 4) x(x), range(0, 4) y(y)
        |  GROUP BY 1, 2),
        |wv AS (
        |  SELECT i.source, i.id, i.ns,
        |    SQRT(AVG(POW(((i.id * 7 + j.j * 3) % 2001) - 1000, 2))) rms
        |  FROM ids i, range(0, 128) j(j) WHERE j.j < i.ns
        |  GROUP BY 1, 2, 3)
        |SELECT i.source, COUNT(*)::BIGINT AS n,
        |  SUM(i.w * i.h)::BIGINT AS n_px,
        |  ROUND(AVG(g.mr), 6) AS avg_r, ROUND(AVG(g.mg), 6) AS avg_g,
        |  ROUND(AVG(g.mb), 6) AS avg_b, ROUND(AVG(r.mr4), 6) AS avg_r4,
        |  SUM(i.ns)::BIGINT AS n_samples,
        |  ROUND(AVG(w.rms), 6) AS avg_rms
        |FROM ids i
        |JOIN imgs g ON g.id = i.id
        |JOIN rs r ON r.id = i.id
        |JOIN wv w ON w.id = i.id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_audio_frames" ->
      """WITH ids AS (
        |  SELECT source, doc_id id, 64 + doc_id % 64 AS ns
        |  FROM documents),
        |smp AS (
        |  SELECT i.source, i.id, j.j, j.j // 32 AS fr,
        |    ((i.id * 7 + j.j * 3) % 2001) - 1000 AS s
        |  FROM ids i, range(0, 128) j(j) WHERE j.j < i.ns),
        |fr AS (
        |  SELECT source, id, fr, COUNT(*) n,
        |    SQRT(AVG(POW(s, 2))) rms, MAX(ABS(s)) peak
        |  FROM smp GROUP BY 1, 2, 3),
        |zc AS (
        |  SELECT a.source, a.id, a.fr,
        |    COUNT(CASE WHEN (a.s >= 0) <> (p.s >= 0) THEN 1 END) z
        |  FROM smp a JOIN smp p
        |    ON p.id = a.id AND p.j = a.j - 1 AND p.fr = a.fr
        |  GROUP BY 1, 2, 3)
        |SELECT f.source, COUNT(*)::BIGINT AS n_frames,
        |  SUM(f.n)::BIGINT AS n_samples,
        |  ROUND(AVG(f.rms), 6) AS avg_rms,
        |  SUM(COALESCE(z.z, 0))::BIGINT AS zcr_sum,
        |  SUM(f.peak)::BIGINT AS peak_sum
        |FROM fr f LEFT JOIN zc z
        |  ON z.id = f.id AND z.fr = f.fr AND z.source = f.source
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_warc_extract" ->
      """WITH d AS (
        |  SELECT doc_id i, 2 + doc_id % 3 nrec FROM documents
        |  WHERE doc_id < 5000),
        |recs AS (
        |  SELECT d.i, r.r, 1 + (d.i + r.r) % 4 AS w,
        |    LENGTH('doc ' || d.i::VARCHAR || ' rec ' || r.r::VARCHAR) AS ulen
        |  FROM d, range(0, 4) r(r) WHERE r.r < d.nrec)
        |SELECT (i % 50) AS host, COUNT(*)::BIGINT AS n_pages,
        |  COUNT(CASE WHEN r % 2 = 0 THEN 1 END)::BIGINT AS n_ok,
        |  SUM(w * ulen + (w - 1))::BIGINT AS text_len,
        |  SUM(4 * w)::BIGINT AS n_tokens
        |FROM recs GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_script_detect" ->
      """WITH d AS (
        |  SELECT source, doc_id i, (doc_id % 5) + 3 a,
        |    (doc_id % 3) + 1 b, doc_id % 4 c
        |  FROM documents),
        |per AS (
        |  -- winner: max count, ties to the alphabetically-smallest
        |  -- name (CYRILLIC < HAN < LATIN); b > 0 always
        |  SELECT source, i, a + b + c letters,
        |    CASE WHEN b >= a AND b >= c THEN 'CYRILLIC'
        |         WHEN c >= a THEN 'HAN' ELSE 'LATIN' END best,
        |    GREATEST(a, b, c)::DOUBLE / (a + b + c) ratio
        |  FROM d)
        |SELECT source, COUNT(*)::BIGINT AS n,
        |  COUNT(CASE WHEN best = 'LATIN' THEN 1 END)::BIGINT AS n_latin,
        |  COUNT(CASE WHEN best = 'CYRILLIC' THEN 1 END)::BIGINT AS n_cyrillic,
        |  COUNT(CASE WHEN best = 'HAN' THEN 1 END)::BIGINT AS n_han,
        |  SUM(letters)::BIGINT AS letters_sum,
        |  ROUND(AVG(ratio), 6) AS avg_ratio
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sitemap" ->
      """WITH d AS (
        |  SELECT source, doc_id i, (doc_id % 4) + 2 n FROM documents
        |  WHERE doc_id < 4000),
        |u AS (
        |  SELECT d.source, d.i, k.k,
        |    CASE WHEN k.k % 2 = 0 THEN 1 ELSE 0 END has_lastmod,
        |    CASE WHEN k.k % 2 = 1
        |      THEN (5 + (d.i + k.k) % 5) / 10.0 ELSE NULL END pri
        |  FROM d, range(0, 5) k(k) WHERE k.k < d.n)
        |SELECT source, COUNT(*)::BIGINT AS n_urls,
        |  SUM(has_lastmod)::BIGINT AS n_lastmod,
        |  COUNT(pri)::BIGINT AS n_priority,
        |  ROUND(SUM(COALESCE(pri, 0)), 6) AS priority_sum,
        |  COUNT(CASE WHEN k = 0 THEN 1 END)::BIGINT AS n_entity_locs
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_robots" ->
      """WITH d AS (SELECT source, doc_id i FROM documents),
        |per AS (
        |  SELECT source, i,
        |    CASE WHEN i % 3 = 0 THEN 0 ELSE 1 END page_ok,
        |    CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END priv_ok,
        |    1 AS pub_ok,
        |    CASE WHEN i % 3 = 0 THEN -1 ELSE 1 + i % 4 END delay,
        |    1 + i % 2 sitemaps
        |  FROM d)
        |SELECT source, COUNT(*)::BIGINT AS n,
        |  SUM(page_ok)::BIGINT AS n_page_ok,
        |  SUM(priv_ok)::BIGINT AS n_priv_ok,
        |  SUM(pub_ok)::BIGINT AS n_pub_ok,
        |  SUM(delay)::BIGINT AS delay_sum,
        |  SUM(sitemaps)::BIGINT AS n_sitemaps
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_boilerplate" ->
      """WITH d AS (
        |  SELECT source, doc_id i, 1 + doc_id % 4 k FROM documents
        |  WHERE doc_id < 4000),
        |paras AS (
        |  SELECT d.i, LENGTH('para ' || d.i::VARCHAR || ' item ' ||
        |    kk.kk::VARCHAR ||
        |    ' alpha beta gamma delta epsilon zeta') plen
        |  FROM d, range(0, 4) kk(kk) WHERE kk.kk < d.k),
        |per AS (
        |  SELECT d.source, d.i,
        |    (SELECT SUM(plen) FROM paras p WHERE p.i = d.i) +
        |      (d.k - 1) clen,
        |    10 * d.k toks
        |  FROM d)
        |SELECT source, COUNT(*)::BIGINT AS n_docs,
        |  SUM(clen)::BIGINT AS content_len,
        |  SUM(toks)::BIGINT AS n_tokens
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bpe_tokens" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    regexp_replace(lower(text), '[^a-z]+', ' ', 'g') t
        |  FROM documents WHERE doc_id < 4000),
        |w AS (
        |  SELECT source, doc_id, unnest(string_split(t, ' ')) AS w
        |  FROM d),
        |e AS (
        |  SELECT source, doc_id,
        |    REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(
        |      REPLACE(w,
        |      'th', CHR(57345)),
        |      CHR(57345) || 'e', CHR(57346)),
        |      'in', CHR(57347)),
        |      'an', CHR(57348)),
        |      CHR(57348) || 'd', CHR(57349)),
        |      'er', CHR(57350)),
        |      'on', CHR(57351)),
        |      're', CHR(57352)) enc
        |  FROM w WHERE w <> ''),
        |agg AS (
        |  SELECT source,
        |    SUM(LENGTH(enc)) n_tokens,
        |    SUM(LENGTH(enc) -
        |      LENGTH(REGEXP_REPLACE(enc, '[^a-z]', '', 'g'))) n_merged
        |  FROM e GROUP BY 1),
        |nd AS (SELECT source, COUNT(*) n_docs FROM d GROUP BY 1)
        |SELECT n.source, n.n_docs::BIGINT AS n_docs,
        |  COALESCE(a.n_tokens, 0)::BIGINT AS n_tokens,
        |  COALESCE(a.n_merged, 0)::BIGINT AS n_merged
        |FROM nd n LEFT JOIN agg a ON a.source = n.source
        |ORDER BY 1""".stripMargin,
    "q_unigram_tokens" ->
      // occ per piece = one-pass REPLACE length delta (no self-overlap
      // possible, so leftmost-non-overlapping == all occurrences);
      // Viterbi tokens per word = len − total occ
      """WITH d AS (
        |  SELECT source, doc_id,
        |    regexp_replace(lower(text), '[^a-z]+', ' ', 'g') t
        |  FROM documents WHERE doc_id < 4000),
        |w AS (
        |  SELECT source, unnest(string_split(t, ' ')) AS w FROM d),
        |e AS (
        |  SELECT source, LENGTH(w) AS len,
        |    (LENGTH(w) - LENGTH(REPLACE(w, 'th', ''))) // 2
        |    + (LENGTH(w) - LENGTH(REPLACE(w, 'an', ''))) // 2
        |    + (LENGTH(w) - LENGTH(REPLACE(w, 're', ''))) // 2
        |    + (LENGTH(w) - LENGTH(REPLACE(w, 'is', ''))) // 2
        |    + (LENGTH(w) - LENGTH(REPLACE(w, 'ol', ''))) // 2
        |    + (LENGTH(w) - LENGTH(REPLACE(w, 'um', ''))) // 2 AS occ
        |  FROM w WHERE w <> ''),
        |agg AS (
        |  SELECT source, SUM(len - occ) AS n_tokens,
        |    SUM(occ) AS n_pieces
        |  FROM e GROUP BY 1),
        |nd AS (SELECT source, COUNT(*) AS n_docs FROM d GROUP BY 1)
        |SELECT n.source, n.n_docs::BIGINT AS n_docs,
        |  COALESCE(a.n_tokens, 0)::BIGINT AS n_tokens,
        |  COALESCE(a.n_pieces, 0)::BIGINT AS n_pieces
        |FROM nd n LEFT JOIN agg a ON a.source = n.source
        |ORDER BY 1""".stripMargin,
    "q_pdf_extract" ->
      """WITH d AS (
        |  SELECT doc_id i, 1 + doc_id % 4 nl FROM documents
        |  WHERE doc_id < 4000),
        |lines AS (
        |  SELECT d.i, LENGTH('doc ' || d.i::VARCHAR || ' line ' ||
        |    k.k::VARCHAR) AS llen
        |  FROM d, range(0, 4) k(k) WHERE k.k < d.nl),
        |per AS (
        |  SELECT d.i, d.nl,
        |    (SELECT SUM(llen) FROM lines l WHERE l.i = d.i) +
        |    LENGTH('id (' || d.i::VARCHAR || ')') + d.nl AS tlen,
        |    4 * d.nl + 2 AS toks
        |  FROM d)
        |SELECT (i % 40) AS bucket, COUNT(*)::BIGINT AS n_docs,
        |  COUNT(*)::BIGINT AS n_pages,
        |  SUM(tlen)::BIGINT AS text_len,
        |  SUM(toks)::BIGINT AS n_tokens
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pdf_cid" ->
      // decoded text closed form: 'doc i plain line\n' +
      // 'doc i cid line #\n' + 'id (i)' — 11 whitespace tokens
      """WITH d AS (
        |  SELECT doc_id i FROM documents WHERE doc_id < 4000),
        |per AS (
        |  SELECT i,
        |    LENGTH('doc ' || i::VARCHAR || ' plain line') + 1 +
        |    LENGTH('doc ' || i::VARCHAR || ' cid line #') + 1 +
        |    LENGTH('id (' || i::VARCHAR || ')') AS tlen
        |  FROM d)
        |SELECT (i % 40) AS bucket, COUNT(*)::BIGINT AS n_docs,
        |  SUM(tlen)::BIGINT AS text_len,
        |  (11 * COUNT(*))::BIGINT AS n_tokens,
        |  0::BIGINT AS n_unmapped
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pdf_encrypted" ->
      // decrypted text == q_pdf_extract's planted lines; cipher split
      // from id parity (even → rc4, odd → aes128), all decryptable
      """WITH d AS (
        |  SELECT doc_id i, 1 + doc_id % 4 nl FROM documents
        |  WHERE doc_id < 4000),
        |lines AS (
        |  SELECT d.i, LENGTH('doc ' || d.i::VARCHAR || ' line ' ||
        |    k.k::VARCHAR) AS llen
        |  FROM d, range(0, 4) k(k) WHERE k.k < d.nl),
        |per AS (
        |  SELECT d.i, d.nl,
        |    (SELECT SUM(llen) FROM lines l WHERE l.i = d.i) +
        |    LENGTH('id (' || d.i::VARCHAR || ')') + d.nl AS tlen,
        |    4 * d.nl + 2 AS toks
        |  FROM d)
        |SELECT (i % 40) AS bucket, COUNT(*)::BIGINT AS n_docs,
        |  SUM(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_rc4,
        |  SUM(CASE WHEN i % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_aes,
        |  COUNT(*)::BIGINT AS n_open,
        |  SUM(tlen)::BIGINT AS text_len,
        |  SUM(toks)::BIGINT AS n_tokens
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pdf_aes256" ->
      // same planted lines; cipher split from id%3 (0,1 → aes256 V5;
      // 2 → aes128 R4 EncryptMetadata-false), all decryptable
      """WITH d AS (
        |  SELECT doc_id i, 1 + doc_id % 4 nl FROM documents
        |  WHERE doc_id < 4000),
        |lines AS (
        |  SELECT d.i, LENGTH('doc ' || d.i::VARCHAR || ' line ' ||
        |    k.k::VARCHAR) AS llen
        |  FROM d, range(0, 4) k(k) WHERE k.k < d.nl),
        |per AS (
        |  SELECT d.i, d.nl,
        |    (SELECT SUM(llen) FROM lines l WHERE l.i = d.i) +
        |    LENGTH('id (' || d.i::VARCHAR || ')') + d.nl AS tlen,
        |    4 * d.nl + 2 AS toks
        |  FROM d)
        |SELECT (i % 40) AS bucket, COUNT(*)::BIGINT AS n_docs,
        |  SUM(CASE WHEN i % 3 < 2 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_aes256,
        |  SUM(CASE WHEN i % 3 = 2 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_aes128,
        |  COUNT(*)::BIGINT AS n_open,
        |  SUM(tlen)::BIGINT AS text_len,
        |  SUM(toks)::BIGINT AS n_tokens
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pdf_objstm" ->
      """WITH d AS (
        |  SELECT doc_id i, 1 + doc_id % 4 nl, 1 + doc_id % 3 np
        |  FROM documents WHERE doc_id < 4000),
        |lines AS (
        |  SELECT d.i, LENGTH('doc ' || d.i::VARCHAR || ' line ' ||
        |    k.k::VARCHAR) AS llen
        |  FROM d, range(0, 4) k(k) WHERE k.k < d.nl),
        |per AS (
        |  SELECT d.i, d.nl, d.np,
        |    (SELECT SUM(llen) FROM lines l WHERE l.i = d.i) +
        |    LENGTH('id (' || d.i::VARCHAR || ')') + d.nl AS tlen,
        |    4 * d.nl + 2 AS toks
        |  FROM d)
        |SELECT (i % 40) AS bucket, COUNT(*)::BIGINT AS n_docs,
        |  SUM(np)::BIGINT AS n_pages, COUNT(*)::BIGINT AS n_v15,
        |  SUM(tlen)::BIGINT AS text_len,
        |  SUM(toks)::BIGINT AS n_tokens
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_warc_gz" ->
      """WITH d AS (
        |  SELECT doc_id i, 2 + doc_id % 3 nrec FROM documents
        |  WHERE doc_id < 4000),
        |recs AS (
        |  SELECT d.i, r.r, 1 + (d.i + r.r) % 4 AS w,
        |    LENGTH('doc ' || d.i::VARCHAR || ' rec ' || r.r::VARCHAR) AS ulen
        |  FROM d, range(0, 4) r(r) WHERE r.r < d.nrec)
        |SELECT (i % 50) AS host, COUNT(*)::BIGINT AS n_pages,
        |  COUNT(CASE WHEN r % 2 = 0 THEN 1 END)::BIGINT AS n_ok,
        |  SUM(w * ulen + (w - 1))::BIGINT AS text_len,
        |  SUM(4 * w)::BIGINT AS n_tokens
        |FROM recs GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_image_dhash" ->
      """WITH pages AS (
        |  SELECT DISTINCT doc_id % 311 AS page FROM documents),
        |dims AS (
        |  SELECT page, (8 + page % 9) w, (8 + (page * 3) % 9) h
        |  FROM pages),
        |grays AS (
        |  SELECT d.page, gx.x, gy.y,
        |    (299 * ((d.page*31 + ((gx.x*d.w)//9)*7 + ((gy.y*d.h)//8)*13) % 256)
        |   + 587 * ((d.page*17 + ((gx.x*d.w)//9)*11 + ((gy.y*d.h)//8)*3) % 256)
        |   + 114 * ((d.page*5 + ((gx.x*d.w)//9)*3 + ((gy.y*d.h)//8)*29) % 256))
        |      // 1000 AS g
        |  FROM dims d, range(0, 9) gx(x), range(0, 8) gy(y)),
        |bits AS (
        |  SELECT a.page, a.y * 8 + a.x AS k
        |  FROM grays a JOIN grays b
        |    ON b.page = a.page AND b.y = a.y AND b.x = a.x + 1
        |  WHERE a.x < 8 AND b.g > a.g),
        |hv AS (
        |  SELECT p.page,
        |    COALESCE(SUM(CASE WHEN k >= 32 THEN (1::BIGINT << (k - 32)) END), 0) hash_hi,
        |    COALESCE(SUM(CASE WHEN k < 32 THEN (1::BIGINT << k) END), 0) hash_lo
        |  FROM pages p LEFT JOIN bits b ON b.page = p.page
        |  GROUP BY 1),
        |counts AS (
        |  SELECT doc_id % 311 AS page, COUNT(*) n FROM documents GROUP BY 1)
        |SELECT c.page, c.n::BIGINT AS n_variants, 1::BIGINT AS n_hashes,
        |  h.hash_hi::BIGINT AS hash_hi, h.hash_lo::BIGINT AS hash_lo
        |FROM counts c JOIN hv h ON h.page = c.page ORDER BY 1""".stripMargin,
    "q_quality_classifier" ->
      """WITH tok AS (
        |  SELECT doc_id, UNNEST(
        |    regexp_split_to_array(LOWER(TRIM(text)), '\s+')) AS t
        |  FROM documents),
        |tok2 AS (SELECT doc_id, t, md5(t) AS m FROM tok WHERE t <> ''),
        |b AS (
        |  SELECT doc_id,
        |    ((CASE WHEN substring(m,1,1) BETWEEN '0' AND '9'
        |           THEN ascii(substring(m,1,1)) - 48
        |           ELSE ascii(substring(m,1,1)) - 87 END) * 16
        |   + CASE WHEN substring(m,2,1) BETWEEN '0' AND '9'
        |          THEN ascii(substring(m,2,1)) - 48
        |          ELSE ascii(substring(m,2,1)) - 87 END) % 13 AS bk
        |  FROM tok2),
        |f AS (
        |  SELECT doc_id, COUNT(*) AS n_tok,
        |    SUM(CASE WHEN bk = 0 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*) f0,
        |    SUM(CASE WHEN bk = 5 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*) f5,
        |    SUM(CASE WHEN bk = 11 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*) f11
        |  FROM b GROUP BY 1)
        |SELECT
        |  (SELECT COUNT(*) FROM documents)::BIGINT AS n,
        |  (SELECT ROUND(SUM(CASE WHEN n_chars > 300 THEN 1.0
        |     ELSE 0.0 END), 1) FROM documents) AS sum_y,
        |  SUM(n_tok)::BIGINT AS tok_sum,
        |  ROUND(SUM(f0), 6) AS f0_sum,
        |  ROUND(SUM(f5), 6) AS f5_sum,
        |  ROUND(SUM(f11), 6) AS f11_sum,
        |  0.0 AS score_bias, 0.0 AS score_f3
        |FROM f""".stripMargin,
    "q_image_phash" -> {
      // the 8x32 fixed-point DCT basis, embedded from the SAME array
      // the Spark-side kernel uses (bit-exact integer replay)
      val basis = graft.multimodal.MultimodalOps.dctBasis
      val tableVals = (for { u <- 0 until 8; x <- 0 until 32 }
        yield s"($u,$x,${basis(u)(x)})").mkString(",")
      s"""WITH pages AS (
         |  SELECT DISTINCT doc_id % 311 AS page FROM documents),
         |dims AS (
         |  SELECT page, (8 + page % 9) w, (8 + (page * 3) % 9) h
         |  FROM pages),
         |g32 AS (
         |  SELECT d.page, gx.x, gy.y,
         |    (299 * ((d.page*31 + ((gx.x*d.w)//32)*7 + ((gy.y*d.h)//32)*13) % 256)
         |   + 587 * ((d.page*17 + ((gx.x*d.w)//32)*11 + ((gy.y*d.h)//32)*3) % 256)
         |   + 114 * ((d.page*5 + ((gx.x*d.w)//32)*3 + ((gy.y*d.h)//32)*29) % 256))
         |      // 1000 AS g
         |  FROM dims d, range(0, 32) gx(x), range(0, 32) gy(y)),
         |t(u, x, t) AS (VALUES $tableVals),
         |rp AS (
         |  SELECT g.page, g.y, t.u, SUM(g.g * t.t)::BIGINT AS r
         |  FROM g32 g JOIN t ON t.x = g.x GROUP BY 1, 2, 3),
         |f AS (
         |  SELECT r.page, tv.u AS v, r.u, SUM(tv.t * r.r)::BIGINT AS f
         |  FROM rp r JOIN t tv ON tv.x = r.y GROUP BY 1, 2, 3),
         |ac AS (
         |  SELECT page, v * 8 + u AS k, f FROM f
         |  WHERE NOT (v = 0 AND u = 0)),
         |med AS (
         |  SELECT page, f AS med FROM (
         |    SELECT page, f,
         |      ROW_NUMBER() OVER (PARTITION BY page ORDER BY f) rn
         |    FROM ac) WHERE rn = 32),
         |bits AS (
         |  SELECT a.page, a.k FROM ac a JOIN med m USING (page)
         |  WHERE a.f > m.med),
         |hv AS (
         |  SELECT p.page,
         |    COALESCE(SUM(CASE WHEN k >= 32 THEN (1::BIGINT << (k - 32)) END), 0) hash_hi,
         |    COALESCE(SUM(CASE WHEN k < 32 THEN (1::BIGINT << k) END), 0) hash_lo
         |  FROM pages p LEFT JOIN bits b ON b.page = p.page
         |  GROUP BY 1),
         |counts AS (
         |  SELECT doc_id % 311 AS page, COUNT(*) n FROM documents GROUP BY 1)
         |SELECT c.page, c.n::BIGINT AS n_variants, 1::BIGINT AS n_hashes,
         |  h.hash_hi::BIGINT AS hash_hi, h.hash_lo::BIGINT AS hash_lo
         |FROM counts c JOIN hv h ON h.page = c.page ORDER BY 1""".stripMargin
    },
    "q_image_dup_pairs" ->
      """WITH pages AS (
        |  SELECT DISTINCT doc_id % 311 AS page FROM documents
        |  WHERE doc_id < 3000),
        |dims AS (
        |  SELECT page, (8 + page % 9) w, (8 + (page * 3) % 9) h
        |  FROM pages),
        |grays AS (
        |  SELECT d.page, gx.x, gy.y,
        |    (299 * ((d.page*31 + ((gx.x*d.w)//9)*7 + ((gy.y*d.h)//8)*13) % 256)
        |   + 587 * ((d.page*17 + ((gx.x*d.w)//9)*11 + ((gy.y*d.h)//8)*3) % 256)
        |   + 114 * ((d.page*5 + ((gx.x*d.w)//9)*3 + ((gy.y*d.h)//8)*29) % 256))
        |      // 1000 AS g
        |  FROM dims d, range(0, 9) gx(x), range(0, 8) gy(y)),
        |bits AS (
        |  SELECT a.page, a.y * 8 + a.x AS k
        |  FROM grays a JOIN grays b
        |    ON b.page = a.page AND b.y = a.y AND b.x = a.x + 1
        |  WHERE a.x < 8 AND b.g > a.g),
        |hv AS (
        |  SELECT p.page,
        |    COALESCE(SUM(CASE WHEN k >= 32 THEN (1::BIGINT << (k - 32)) END), 0) hh,
        |    COALESCE(SUM(CASE WHEN k < 32 THEN (1::BIGINT << k) END), 0) hl
        |  FROM pages p LEFT JOIN bits b ON b.page = p.page
        |  GROUP BY 1),
        |dh AS (
        |  SELECT d.doc_id, h.hh, h.hl
        |  FROM documents d JOIN hv h ON h.page = d.doc_id % 311
        |  WHERE d.doc_id < 3000)
        |SELECT COUNT(*)::BIGINT AS n_pairs,
        |  SUM(a.doc_id + b.doc_id)::BIGINT AS pair_id_sum
        |FROM dh a JOIN dh b
        |  ON a.hh = b.hh AND a.hl = b.hl AND a.doc_id < b.doc_id""".stripMargin,
    "q_image_block" ->
      s"""WITH ${dHashCte(97)},
        |dh AS (
        |  SELECT d.doc_id, (d.doc_id // 97) % 2 AS shard, h.hh, h.hl
        |  FROM documents d JOIN hv h ON h.page = d.doc_id % 97
        |  WHERE d.doc_id < 3000)
        |SELECT COUNT(*)::BIGINT AS n_pairs,
        |  COALESCE(SUM(a.doc_id + b.doc_id), 0)::BIGINT AS pair_id_sum,
        |  0::BIGINT AS n_cross
        |FROM dh a JOIN dh b
        |  ON a.hh = b.hh AND a.hl = b.hl AND a.shard = b.shard
        |  AND a.doc_id < b.doc_id""".stripMargin,
    "q_incremental_image" ->
      s"""WITH ${dHashCte(311)},
        |dh AS (
        |  SELECT d.doc_id, h.hh, h.hl
        |  FROM documents d JOIN hv h ON h.page = d.doc_id % 311
        |  WHERE d.doc_id < 3000)
        |SELECT (SELECT COUNT(*) FROM dh a JOIN dh b
        |    ON a.hh = b.hh AND a.hl = b.hl AND a.doc_id < b.doc_id
        |    AND a.doc_id % 2 <> b.doc_id % 2)::BIGINT AS n_ident_cross,
        |  true AS ident_found,
        |  true AS inc_equals_full""".stripMargin,
    "q_image_clusters" ->
      """WITH pages AS (
        |  SELECT DISTINCT doc_id % 311 AS page FROM documents
        |  WHERE doc_id < 3000),
        |dims AS (
        |  SELECT page, (8 + page % 9) w, (8 + (page * 3) % 9) h
        |  FROM pages),
        |grays AS (
        |  SELECT d.page, gx.x, gy.y,
        |    (299 * ((d.page*31 + ((gx.x*d.w)//9)*7 + ((gy.y*d.h)//8)*13) % 256)
        |   + 587 * ((d.page*17 + ((gx.x*d.w)//9)*11 + ((gy.y*d.h)//8)*3) % 256)
        |   + 114 * ((d.page*5 + ((gx.x*d.w)//9)*3 + ((gy.y*d.h)//8)*29) % 256))
        |      // 1000 AS g
        |  FROM dims d, range(0, 9) gx(x), range(0, 8) gy(y)),
        |bits AS (
        |  SELECT a.page, a.y * 8 + a.x AS k
        |  FROM grays a JOIN grays b
        |    ON b.page = a.page AND b.y = a.y AND b.x = a.x + 1
        |  WHERE a.x < 8 AND b.g > a.g),
        |hv AS (
        |  SELECT p.page,
        |    COALESCE(SUM(CASE WHEN k >= 32 THEN (1::BIGINT << (k - 32)) END), 0) hh,
        |    COALESCE(SUM(CASE WHEN k < 32 THEN (1::BIGINT << k) END), 0) hl
        |  FROM pages p LEFT JOIN bits b ON b.page = p.page
        |  GROUP BY 1),
        |dh AS (
        |  SELECT d.doc_id, h.hh, h.hl
        |  FROM documents d JOIN hv h ON h.page = d.doc_id % 311
        |  WHERE d.doc_id < 3000),
        |g AS (
        |  SELECT hh, hl, MIN(doc_id) mid, COUNT(*) cnt
        |  FROM dh GROUP BY 1, 2 HAVING COUNT(*) > 1)
        |SELECT SUM(cnt)::BIGINT AS n_clustered,
        |  COUNT(*)::BIGINT AS n_clusters,
        |  SUM(mid * cnt)::BIGINT AS comp_sum,
        |  SUM(cnt * cnt)::BIGINT AS csize_sum
        |FROM g""".stripMargin,
    "q_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id, doc_id % 1000 AS page FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    (CASE WHEN page % 2 = 0 THEN 'http' ELSE 'https' END) ||
        |    '://ex' || (page % 7)::VARCHAR || '.com/p/' ||
        |    page::VARCHAR || '?cat=' || (page % 5)::VARCHAR ||
        |    '&id=' || page::VARCHAR AS canonical_url
        |  FROM u)
        |SELECT canonical_url, MIN(doc_id)::BIGINT AS keep_id,
        |  COUNT(*)::BIGINT AS n_variants
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_webp_decode" ->
      """WITH ids AS (
        |  SELECT source, doc_id id, (4 + doc_id % 13) w,
        |    (4 + (doc_id * 5) % 11) h
        |  FROM documents),
        |imgs AS (
        |  SELECT i.source, i.id, i.w, i.h,
        |    AVG((i.id * 31 + x.x * 7 + y.y * 13) % 256) mr,
        |    AVG((i.id * 17 + x.x * 11 + y.y * 3) % 256) mg,
        |    AVG((i.id * 5 + x.x * 3 + y.y * 29) % 256) mb
        |  FROM ids i, range(0, 17) x(x), range(0, 15) y(y)
        |  WHERE x.x < i.w AND y.y < i.h
        |  GROUP BY 1, 2, 3, 4)
        |SELECT source, COUNT(*)::BIGINT AS n, COUNT(*)::BIGINT AS n_decoded,
        |  SUM(w * h)::BIGINT AS n_px,
        |  ROUND(AVG(mr), 6) AS avg_r, ROUND(AVG(mg), 6) AS avg_g,
        |  ROUND(AVG(mb), 6) AS avg_b
        |FROM imgs GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_webp_lossy" ->
      """WITH ids AS (
        |  SELECT source, doc_id id, 16 * (1 + doc_id % 5) w,
        |    16 * (1 + (doc_id * 3) % 4) h
        |  FROM documents)
        |SELECT source, COUNT(*)::BIGINT AS n, COUNT(*)::BIGINT AS n_meta,
        |  COUNT(*)::BIGINT AS n_webp, SUM(w * h)::BIGINT AS n_px,
        |  0::BIGINT AS n_decoded, TRUE AS pixels_ok
        |FROM ids GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_video_frames" ->
      """WITH ids AS (
        |  SELECT source, doc_id id, (3 + doc_id % 5) nf,
        |    (4 + doc_id % 6) w, (4 + (doc_id * 3) % 7) h,
        |    ((3 + doc_id % 5) + 2) // 3 kfn
        |  FROM documents),
        |fr AS (
        |  SELECT i.source, i.id, f.f,
        |    AVG((i.id * 31 + f.f * 19 + x.x * 7 + y.y * 13) % 256) mr,
        |    AVG((i.id * 17 + f.f * 23 + x.x * 11 + y.y * 3) % 256) mg,
        |    AVG((i.id * 5 + f.f * 29 + x.x * 3 + y.y * 29) % 256) mb
        |  FROM ids i, range(0, 7) f(f), range(0, 10) x(x), range(0, 11) y(y)
        |  WHERE f.f < i.nf AND x.x < i.w AND y.y < i.h
        |  GROUP BY 1, 2, 3),
        |vid AS (
        |  SELECT source, id, COUNT(*) nf2,
        |    AVG(mr) amr, AVG(mg) amg, AVG(mb) amb
        |  FROM fr GROUP BY 1, 2),
        |-- sampleKeyframes(2): m = least(2, kfn) keyframes, the j-th
        |-- sampled one is keyframe (j*kfn)//m, i.e. frame 3*that
        |samp AS (
        |  SELECT i.source, i.id,
        |    SUM(3 * ((s.j * i.kfn) // LEAST(2, i.kfn))) sidx,
        |    COUNT(*) m
        |  FROM ids i, range(0, 2) s(j)
        |  WHERE s.j < LEAST(2, i.kfn)
        |  GROUP BY 1, 2)
        |SELECT i.source, COUNT(*)::BIGINT AS n,
        |  SUM(i.nf)::BIGINT AS n_frames,
        |  SUM(i.kfn)::BIGINT AS n_keyframes,
        |  ROUND(AVG(v.amr), 6) AS avg_r, ROUND(AVG(v.amg), 6) AS avg_g,
        |  ROUND(AVG(v.amb), 6) AS avg_b,
        |  SUM(p.sidx)::BIGINT AS sampled_idx_sum,
        |  SUM(p.m)::BIGINT AS n_sampled
        |FROM ids i
        |JOIN vid v ON v.id = i.id
        |JOIN samp p ON p.id = i.id
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
