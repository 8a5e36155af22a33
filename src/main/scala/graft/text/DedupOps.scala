package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH banding, SimHash. All hashing is md5-derived
  * (Tables.hashVal32) so results are portable to the SQL oracle.
  *
  * Scale shapes:
  *  - exact dedup: one shuffle on the content hash (never on the text).
  *  - Jaccard: explode distinct shingles → self-equi-join on shingle →
  *    count per pair. The join key is the shingle, so only docs sharing
  *    a shingle ever meet — no O(n²) cross join.
  *  - MinHash LSH: k hash mins per doc (one aggregation), band →
  *    equi-join on (band, signature). Candidate pairs only.
  *  - SimHash: one aggregation producing a 32-bit signature per doc.
  */
object DedupOps {

  /** Exact dedup groups: content hash → representative (min id) + size.
    * GroupBy on the 32-char md5, never on the document body. */
  def exactGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("content_hash"))
      .agg(min(col(id)).as("representative"), count(lit(1)).as("group_size"))

  /** Keep one row per distinct content (the min-id representative). */
  def exactDedup(df: DataFrame, id: String, text: String): DataFrame = {
    val w = Window.partitionBy(md5(col(text))).orderBy(col(id).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** (id, shingle) long table, distinct per doc. Tokenizes into a real
    * array column FIRST so the shingle lambda does array lookups instead
    * of re-splitting the text per element (see shinglesFromTokens). */
  def shingleTable(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.select(col(id), TextOps.tokens(col(text)).as("__ts"))
      .select(col(id),
        explode(TextOps.shinglesFromTokens(col("__ts"), n)).as("shingle"))
      .distinct()

  /** Decontamination scan (the GPT-3 appendix-C / training-pipeline
    * shape): flag corpus documents sharing any token n-gram with a
    * benchmark/eval document set. The benchmark side is SMALL by
    * construction (eval sets are thousands of docs, the corpus is
    * billions), so its distinct shingle set BROADCASTS and the corpus
    * shingles are probed with a broadcast hash join — the corpus never
    * shuffles on text at any size; only the per-doc hit counts shuffle,
    * keyed by id. Returns (id, n_hits, first_hit) per contaminated doc. */
  def contamination(corpus: DataFrame, bench: DataFrame, id: String,
                    text: String, n: Int): DataFrame = {
    val corpusSh = shingleTable(corpus, id, text, n)
    val benchSh = shingleTable(bench, id, text, n)
      .select(col("shingle")).distinct()
    corpusSh.join(broadcast(benchSh), "shingle")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_hits"), min(col("shingle")).as("first_hit"))
  }

  /** N-gram Jaccard similarity for all pairs sharing ≥1 shingle;
    * keeps pairs with similarity ≥ threshold. Pure integer counting
    * until the final division → deterministic.
    *
    * `maxDocFreq` is the 100 TB skew guard: a shingle occurring in more
    * than that many documents is a stop-shingle — it contributes n²
    * join rows on ONE key (the classic hot-key blowup) while carrying
    * no near-dup signal. Capping drops those shingles BEFORE the
    * equi-join and computes Jaccard over the retained shingle sets
    * (the standard pipeline approximation); None keeps the exact
    * reference semantics. */
  /** Above this estimated candidate-pair count (Σ df·(df−1)/2 over the
    * retained shingle document frequencies) [[jaccardPairs]] fails fast
    * instead of attempting the self-join — the sf10 rehearsal showed the
    * uncapped twin filling 77 GB of shuffle disk at ~12.4G pairs before
    * dying anyway. Overridable via `graft.dedup.maxJaccardPairs`. */
  val DefaultMaxJaccardPairs: Long = 2_000_000_000L

  def jaccardPairs(df: DataFrame, id: String, text: String, n: Int,
                   threshold: Double,
                   maxDocFreq: Option[Int] = None): DataFrame = {
    val shAll = shingleTable(df, id, text, n)
    // ONE doc-frequency reduction serves both the stop-shingle cap and
    // the fail-fast pair estimate below (it previously ran twice: once
    // inside the capped-join plan and once re-grouping the cached
    // retained shingles — a full extra pass over the shingle table).
    // Checkpointed eagerly: it is one row per distinct shingle, consumed
    // by two independent subtrees.
    val dfreqAll = shAll.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
      .localCheckpoint(true)
    val sh = (maxDocFreq match {
      case Some(cap) =>
        shAll.join(dfreqAll.filter(col("__df") <= cap)
          .select(col("shingle")), "shingle")
      case None => shAll
    }).cache()
    // fail-fast skew guard: the shingle self-join below materializes
    // exactly Σ df·(df−1)/2 candidate rows; estimate it from the
    // retained document frequencies and refuse a job that can only end
    // in a disk-filling shuffle. Scale paths that stay sub-quadratic at
    // any corpus size: a maxDocFreq cap (dedup_ngram_jaccard_capped)
    // or MinHash-LSH banding (dedup_minhash_lsh / minhashBandPairs).
    val maxPairs = df.sparkSession.conf
      .getOption("graft.dedup.maxJaccardPairs").map(_.toLong)
      .getOrElse(DefaultMaxJaccardPairs)
    val estPairs = {
      // decimal throughout: df·(df−1) overflows a long once df > ~3e9,
      // which a 100 TB hot shingle can reach
      val d = col("__df").cast("decimal(19,0)")
      Option(maxDocFreq.fold(dfreqAll)(cap =>
            dfreqAll.filter(col("__df") <= cap))
          .agg(sum((d * (d - 1) / 2).cast("decimal(38,0)")).as("p"))
          .head.getDecimal(0))
        .map(_.toBigInteger).getOrElse(java.math.BigInteger.ZERO)
    }
    if (estPairs.compareTo(java.math.BigInteger.valueOf(maxPairs)) > 0) {
      sh.unpersist(false)
      throw new IllegalStateException(
        s"jaccardPairs would materialize ~$estPairs candidate pairs " +
        s"(> $maxPairs, graft.dedup.maxJaccardPairs): the all-pairs " +
        "shingle self-join is quadratic in hot-shingle document " +
        "frequency. Use a maxDocFreq cap (dedup_ngram_jaccard_capped " +
        "semantics) or MinHash-LSH banding (dedup_minhash_lsh) at this " +
        "scale, or raise graft.dedup.maxJaccardPairs explicitly.")
    }
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"), Seq("shingle"))
      .filter(col(s"a.$id") < col(s"b.$id"))
      .groupBy(col(s"a.$id").as("id1"), col(s"b.$id").as("id2"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed(id, "id1").withColumnRenamed("n_sh", "n1"), "id1")
      .join(sizes.withColumnRenamed(id, "id2").withColumnRenamed("n_sh", "n2"), "id2")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n1") + col("n2") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("n_inter"), col("jaccard"))
  }

  /** Fixed MinHash permutation parameters (a odd < 2^30, b < p, p prime).
    * h_j(x) = (a_j·x + b_j) mod p over the 32-bit shingle hash; products
    * stay < 2^62 so 64-bit integer math is exact in both engines. */
  val MinhashP: Long = 2147483647L
  val MinhashParams: Seq[(Long, Long)] = Seq(
    (387461293L, 1299721L),  (576402349L, 15485863L),
    (741204817L, 32452843L), (862910293L, 49979687L),
    (198491317L, 67867967L), (322089721L, 86028121L),
    (493024217L, 104395301L),(611952937L, 122949823L),
    (137482951L, 141650939L),(259841203L, 160481183L),
    (379421581L, 179424673L),(502134347L, 198491317L),
    (623845921L, 217645177L),(744892193L, 236887691L),
    (866421487L, 256203161L),(987514139L, 275604541L))

  /** Per-doc MinHash signature: k min-hash columns m0..m{k-1} as a PURE
    * NARROW MAP — tokens → shingle array → hashing + all k permutation
    * minima fused into one codegen'd pass (MinhashSigs). `xx` picks the
    * codegen-native xxhash64 scale hash vs the oracle-portable md5.
    *
    * No explode, no groupBy: the previous exploded-shingle aggregation
    * shuffled |docs|·|shingles| rows into the cluster before reducing
    * them right back to one row per doc; signatures have no cross-row
    * dependency, so at 100 TB this shape keeps the entire signature
    * stage shuffle-free (the only exchange left in LSH dedup is the
    * banded candidate self-join). Values are bit-identical: MIN over
    * the shingle multiset equals MIN over the distinct set the oracle
    * aggregates. (The hash must live INSIDE the fused expression — a
    * `transform(sh, hasher)` lambda evaluates interpreted per element
    * and measured 3× slower than the exploded form it replaced.) */
  def minhashSignaturesWith(df: DataFrame, id: String, text: String, n: Int,
                            xx: Boolean): DataFrame = {
    val sigs = df
      .select(col(id), TextOps.tokens(col(text)).as("__ts"))
      .filter(size(col("__ts")) >= n) // shingle set empty below n tokens
      .withColumn("__mins", graft.functions.MinhashExpr.minhashSigs(
        col("__ts"), n, MinhashParams, MinhashP, xx))
    sigs.select(col(id) +: MinhashParams.indices.map(j =>
      element_at(col("__mins"), j + 1).as(s"m$j")): _*)
  }

  /** Oracle-portable variant: md5-derived 32-bit hash (matches the DuckDB
    * twin bit-for-bit, but pays md5's per-shingle cost). */
  def minhashSignatures(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    minhashSignaturesWith(df, id, text, n, xx = false)

  /** Scale-path variant: xxhash64 (codegen-native, no string md5) folded
    * into the 32-bit range. Same banding downstream; the DuckDB twin
    * replays the hash via the pure-SQL Xxh64Sql macros. */
  def minhashSignaturesFast(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    minhashSignaturesWith(df, id, text, n, xx = true)

  /** LSH banding: b bands × r rows (b·r = 16). Docs sharing any band
    * signature become candidate pairs. Returns distinct (id1 < id2).
    *
    * One explode produces all band rows in a single pass over the
    * signatures (a union of b selects would recompute the signature
    * aggregation b times), and both join sides share the identical
    * subplan so Spark reuses the shuffle (ReusedExchange). */
  /** (id, band, sig) rows of the banded signature — one explode pass
    * over the aggregated signatures. Shared by the self-join candidates
    * and the incremental batch-vs-corpus filter. */
  def minhashBandRows(sig: DataFrame, id: String,
                      bands: Int, rows: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => col(s"m${b * rows + r}"))
      struct(lit(b).as("band"), concat_ws("_", cols: _*).as("sig"))
    }
    sig.select(col(id), explode(array(bandStructs: _*)).as("bs"))
      .select(col(id), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  def minhashCandidates(sig: DataFrame, id: String,
                        bands: Int = 4, rows: Int = 4): DataFrame = {
    // The signature table is tiny relative to the corpus (n_docs × k
    // longs) but expensive to produce (shingle explode + aggregation);
    // persist it so the self-join's two sides don't recompute it.
    val bandRows = minhashBandRows(sig.cache(), id, bands, rows)
    bandRows.as("x").join(bandRows.as("y"), Seq("band", "sig"))
      .filter(col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").as("id1"), col(s"y.$id").as("id2"))
      .distinct()
  }

  /** Near-dup clustering + canonical selection — the standard
    * training-corpus dedup finisher (C4/RefinedWeb-style): candidate
    * pairs (from MinHash banding or any pair source) become connected
    * components via large-star/small-star (Clustering
    * .connectedComponentsLSS — O(log n) rounds regardless of component
    * diameter, where min-label propagation pays O(diameter) rounds on
    * the long template-drift chains real corpora produce), and each
    * component keeps ONE canonical doc (smallest id — deterministic).
    * Returns (doc id, canonical id, keep flag); docs without any dup
    * pair are their own canonical. */
  def canonicalize(docs: DataFrame, pairs: DataFrame, id: String): DataFrame = {
    val labels = graft.ml.Clustering.connectedComponentsLSS(
      pairs.select(col("id1").as("u"), col("id2").as("v")))
    docs.select(col(id))
      .join(labels.withColumnRenamed("node", id), Seq(id), "left")
      .select(col(id),
        coalesce(col("label"), col(id)).as("canonical_id"))
      .withColumn("keep", (col(id) === col("canonical_id")).cast("int"))
  }

  /** 32-bit SimHash over whitespace tokens (with multiplicity): bit j of
    * the signature is set iff Σ_tokens (2·bit_j(h(token)) − 1) > 0. */
  def simhash(df: DataFrame, id: String, text: String): DataFrame = {
    val tok = df.select(col(id),
      explode(TextOps.tokens(col(text))).as("__t"))
      .withColumn("__h", hashVal32(col("__t")))
    val bitSums = (0 until 32).map { j =>
      sum(pmod(floor(col("__h") / math.pow(2, j).toLong), lit(2L)) * 2 - 1)
        .as(s"__b$j")
    }
    val agg = tok.groupBy(col(id)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 32).map { j =>
      when(col(s"__b$j") > 0, math.pow(2, j).toLong).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col(id), sig.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` bits.
    *
    * For maxHamming ≤ 3 (the standard near-dup radius) candidates come
    * from LSH banding: the 32-bit signature splits into 4 byte-bands,
    * and by pigeonhole two signatures within Hamming distance 3 agree
    * on at least one whole byte — so the pair table is an equi-join on
    * (band index, band value), never an all-pairs scan, and the exact
    * Hamming post-filter keeps the result identical to the naive
    * formulation. For larger radii (no pigeonhole guarantee from 4
    * bands of 32 bits) it falls back to the quadratic pair check —
    * callers at scale should stay within the banded radius. */
  def simhashPairs(sig: DataFrame, id: String, maxHamming: Int): DataFrame = {
    if (maxHamming <= 3) {
      val banded = sig.select(col(id), col("simhash"),
        explode(array((0 until 4).map(bnd => struct(lit(bnd).as("bno"),
          shiftright(col("simhash"), 8 * bnd).bitwiseAND(lit(255L))
            .as("bval"))): _*)).as("band"))
        .select(col(id), col("simhash"),
          col("band.bno").as("bno"), col("band.bval").as("bval"))
      val a = banded.select(col(id).as("id1"), col("simhash").as("s1"),
        col("bno"), col("bval"))
      val b = banded.select(col(id).as("id2"), col("simhash").as("s2"),
        col("bno"), col("bval"))
      a.join(b, Seq("bno", "bval"))
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"), col("s1"), col("s2"))
        .distinct() // a pair may agree on several bands
        .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
        .filter(col("hamming") <= maxHamming)
        .select(col("id1"), col("id2"), col("hamming"))
    } else {
      val a = sig.select(col(id).as("id1"), col("simhash").as("s1"))
      val b = sig.select(col(id).as("id2"), col("simhash").as("s2"))
      a.join(b, col("id1") < col("id2"))
        .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
        .filter(col("hamming") <= maxHamming)
        .select(col("id1"), col("id2"), col("hamming"))
    }
  }

  // ---- exact-substring dedup (deduplicate-text-datasets, Lee et al.
  // 2022): flag/trim any minRun-token contiguous window occurring more
  // than once in the corpus — the positional complement of exactDedup's
  // whole-document hash. Never all-pairs: duplicate detection is one
  // groupBy on the 128-bit window key; only the PAIRS variant joins,
  // and it carries the jaccardPairs fail-fast volume guard. ----

  /** Positional n-gram table: (id, pos, __gh, __gh2) — one row per
    * minRun-token window, pos = 0-based token start, two independent
    * XXH64 hashes of the window's space-joined tokens
    * ([[graft.functions.GramHash]]; strings never materialized, never
    * shuffled). */
  private def posGramTable(df: DataFrame, id: String, text: String,
                           minRun: Int): DataFrame =
    df.select(col(id), TextOps.tokens(col(text)).as("__ts"))
      .select(col(id), posexplode(arrays_zip(
          graft.functions.GramHashExpr.gramHashes(col("__ts"), minRun, 42L),
          graft.functions.GramHashExpr.gramHashes(col("__ts"), minRun, 7L))))
      .select(col(id), col("pos"),
        col("col")("0").as("__gh"), col("col")("1").as("__gh2"))

  /** Maximal duplicated spans per document: (id, span_start, span_end)
    * in 0-based token positions, inclusive. A position starts a
    * duplicated window iff the same minRun-token window occurs anywhere
    * else in the corpus (cross-document or repeated in-document — the
    * deduplicate-text-datasets criterion); overlapping and adjacent
    * windows coalesce into maximal runs (union of covered tokens).
    *
    * Scale shape: gram table ~ token count rows keyed by 16 B;
    * duplicate detection = one partial-agg groupBy + a semi-join back;
    * coalescing = one window per doc. Everything linear in corpus
    * tokens — no join ever expands. */
  def exactSubstringSpans(df: DataFrame, id: String, text: String,
                          minRun: Int): DataFrame = {
    // deliberately NOT cached although the dup-detection aggregate and
    // the semi-join probe both read it: an A/B at sf10 (27M grams)
    // measured the cached variant 1.3× SLOWER (40.8–42.7 s vs
    // 28.2–37.1 warm) — materializing a token-scale table costs more
    // than re-running the codegen'd kernel over the page-cached scan,
    // and at 100 TB caching token-scale intermediates is wrong anyway
    val g = posGramTable(df, id, text, minRun)
    val dup = g.groupBy(col("__gh"), col("__gh2"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
      .select(col("__gh"), col("__gh2"))
    val hits = g.join(dup, Seq("__gh", "__gh2"), "left_semi")
    // gaps-and-islands: starts p < q produce overlapping-or-adjacent
    // coverage iff q ≤ p + minRun, so a gap > minRun opens a new span
    val w = Window.partitionBy(col(id)).orderBy(col("pos"))
    hits
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(w) > minRun, 1)
          .otherwise(0))
      .withColumn("__isl", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(id), col("__isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(minRun) - 1).as("span_end"))
      .select(col(id), col("span_start"), col("span_end"))
  }

  /** Trim pass: documents with every duplicated span removed (ALL
    * occurrences, the Lee et al. semantics) — (id, text_trimmed,
    * n_kept). Span removal happens in the ARRAY domain: only the small
    * per-doc span lists shuffle (collect_list keyed by id); the
    * document text itself joins once and is filtered in place. */
  def trimExactSubstrings(df: DataFrame, id: String, text: String,
                          minRun: Int): DataFrame = {
    val spans = exactSubstringSpans(df, id, text, minRun)
      .groupBy(col(id))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__spans"))
    // "full" ≡ left (span keys ⊆ df), but not outer-join-eliminable:
    // a count()-only consumer (the bench/smoke protocol) must still
    // pay for the span computation it is timing
    df.join(spans, Seq(id), "full")
      .select(col(id), TextOps.tokens(col(text)).as("__ts"),
        coalesce(col("__spans"),
          array().cast("array<struct<s:int,e:int>>")).as("__spans"))
      .select(col(id),
        transform(
          filter(sequence(lit(0), size(col("__ts")) - 1),
            i => !exists(col("__spans"),
              s => i >= s("s") && i <= s("e"))),
          i => element_at(col("__ts"), i + 1)).as("__kept"))
      .select(col(id),
        concat_ws(" ", col("__kept")).as("text_trimmed"),
        size(col("__kept")).as("n_kept"))
  }

  /** Above this estimated matched-window-pair count (Σ c·(c−1)/2 over
    * window-key occupancies) [[exactSubstringPairs]] fails fast — a
    * boilerplate window shared by df documents contributes df² join
    * rows on one key, the same hot-key blowup the Jaccard guard stops.
    * Overridable via `graft.dedup.maxSubstringPairs`. */
  val DefaultMaxSubstringPairs: Long = 2_000_000_000L

  /** Document pairs sharing a ≥minRun-token contiguous run, with the
    * length of the LONGEST shared run: (id_a, id_b, max_run_tokens).
    * Matched windows join on the 128-bit key (equi-join — only docs
    * sharing a window ever meet); within a pair, windows on one
    * diagonal (pos_a − pos_b constant) with consecutive starts extend
    * one run of (consecutive count + minRun − 1) tokens. */
  def exactSubstringPairs(df: DataFrame, id: String, text: String,
                          minRun: Int): DataFrame = {
    val g = posGramTable(df, id, text, minRun).cache()
    val maxPairs = df.sparkSession.conf
      .getOption("graft.dedup.maxSubstringPairs").map(_.toLong)
      .getOrElse(DefaultMaxSubstringPairs)
    val estPairs = {
      val c = col("__c").cast("decimal(19,0)")
      Option(g.groupBy(col("__gh"), col("__gh2"))
          .agg(count(lit(1)).as("__c"))
          .agg(sum((c * (c - 1) / 2).cast("decimal(38,0)")).as("p"))
          .head.getDecimal(0))
        .map(_.toBigInteger).getOrElse(java.math.BigInteger.ZERO)
    }
    if (estPairs.compareTo(java.math.BigInteger.valueOf(maxPairs)) > 0) {
      g.unpersist(false)
      throw new IllegalStateException(
        s"exactSubstringPairs would materialize ~$estPairs matched " +
        s"window pairs (> $maxPairs, graft.dedup.maxSubstringPairs): " +
        "a boilerplate window shared by df documents joins df² rows " +
        "on one key. Use exactSubstringSpans/trimExactSubstrings (the " +
        "linear flag/trim pass) at this scale, or raise " +
        "graft.dedup.maxSubstringPairs explicitly.")
    }
    val cand = g.as("a").join(g.as("b"),
        col("a.__gh") === col("b.__gh") &&
          col("a.__gh2") === col("b.__gh2") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"),
        col("a.pos").as("pos_a"), (col("a.pos") - col("b.pos")).as("__diag"))
    val w = Window.partitionBy(col("id_a"), col("id_b"), col("__diag"))
      .orderBy(col("pos_a"))
    cand
      .withColumn("__new",
        when(col("pos_a") - lag(col("pos_a"), 1).over(w) > 1, 1)
          .otherwise(0))
      .withColumn("__isl", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id_a"), col("id_b"), col("__diag"), col("__isl"))
      .agg((count(lit(1)) + minRun - 1).as("__run"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("__run")).as("max_run_tokens"))
  }
}
