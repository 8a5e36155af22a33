package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Tables._
import graft.text.{TextOps, DedupOps, BpeOps}
import graft.queries.SqlGen._

/** Oracle-verified text-analysis + deduplication queries over the
  * `documents` table — the training-data-pipeline operator family. */
object TextQueries {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** DuckDB twin of TextOps.shingles(n=3) as a FROM-clause fragment:
    * (doc_id, shingle) distinct rows. */
  private val shingleSqlDistinct: String =
    """SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(ts) - 1),
      |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents))""".stripMargin

  private val enList = TextOps.StopwordsEn.map(w => s"'$w'").mkString(", ")

  /** Unrolled-CTE replay of `rounds` BPE merge rounds over the
    * documents word table — the DuckDB twin of BpeOps.trainLoop's
    * wrapped-symbol device (chr(31) = the U+001F wrap; a greedy
    * left-to-right merge is a literal replace() in both engines).
    * Defines `words`, `s0`, and per-round `p_r` (pair counts), `t_r`
    * (winning merge); the post-merge table `s_r` is emitted for rounds
    * ≤ mergeThrough (the trainer's last round never needs its merged
    * table, the encoder needs all of them). */
  private def bpeSqlCtes(rounds: Int, mergeThrough: Int,
                         where: String = ""): String = {
    def roundCtes(r: Int, needMerge: Boolean): String = {
      val pairs = s"""p$r AS MATERIALIZED (
        |  SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occ FROM (
        |    SELECT n, arr[i] || chr(31) || arr[i+1] AS pair FROM (
        |      SELECT n, arr, unnest(range(1, len(arr))) AS i FROM (
        |        SELECT n, string_split(trim(syms, chr(31)),
        |          chr(31) || chr(31)) AS arr FROM s${r - 1})
        |      WHERE len(arr) >= 2))
        |  GROUP BY pair),
        |t$r AS MATERIALIZED (
        |  SELECT pair, n_occ FROM p$r
        |  ORDER BY n_occ DESC, pair ASC LIMIT 1)""".stripMargin
      // LEFT JOIN + CASE: an exhausted round (empty t_r) must be a
      // no-op — the Scala trainer stops early and applyBpe applies
      // only the learned merges, so a bare cross join would wrongly
      // empty every later table
      val merge = s""",
        |s$r AS MATERIALIZED (
        |  SELECT s.n, CASE WHEN t.pair IS NULL THEN s.syms
        |    ELSE replace(s.syms,
        |      chr(31) || string_split(t.pair, chr(31))[1] || chr(31) ||
        |        chr(31) || string_split(t.pair, chr(31))[2] || chr(31),
        |      chr(31) || replace(t.pair, chr(31), '') || chr(31))
        |    END AS syms
        |  FROM s${r - 1} s LEFT JOIN t$r t ON TRUE)""".stripMargin
      if (needMerge) pairs + merge else pairs
    }
    s"""words AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS n FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents$where)
       |  GROUP BY w),
       |s0 AS MATERIALIZED (
       |  SELECT n, regexp_replace(w, '(.)',
       |    chr(31) || '\\1' || chr(31), 'g') AS syms FROM words),
       |${(1 to rounds).map(r => roundCtes(r, needMerge = r <= mergeThrough)).mkString(",\n")}""".stripMargin
  }

  /** DuckDB twin of DedupOps.posGramTable at minRun = 10 (string grams
    * where Spark carries the 128-bit hash pair — equality is over the
    * identical "t1 … t10" join either way): `toks` = (doc_id, tok,
    * 0-based pos), `g` = (doc_id, pos, gram) one row per full 10-token
    * window. */
  private val posGramSql: String =
    """toks AS MATERIALIZED (
      |  SELECT doc_id, ts[i] AS tok, i - 1 AS pos
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |       unnest(range(1, len(ts) + 1)) AS u(i)
      |), g AS MATERIALIZED (
      |  SELECT doc_id, pos, gram FROM (
      |    SELECT doc_id, pos,
      |      string_agg(tok, ' ') OVER w AS gram,
      |      count(*) OVER w AS glen
      |    FROM toks
      |    WINDOW w AS (PARTITION BY doc_id ORDER BY pos
      |                 ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING))
      |  WHERE glen = 10)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("text_stats", // token counting / length stats per document
      (s, d) => docs(s, d).select(
          col("doc_id"),
          TextOps.nTokens(col("text")).as("n_tokens"),
          TextOps.nTypes(col("text")).as("n_types"),
          TextOps.typeTokenRatio(col("text")).as("ttr"),
          TextOps.nChars(col("text")).as("n_chars_m"),
          TextOps.meanTokenLen(col("text")).as("mean_tok_len"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_types,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |    / len(string_split(text, ' ')) AS ttr,
             |  CAST(length(text) AS INT) AS n_chars_m,
             |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
             |    / len(string_split(text, ' ')) AS mean_tok_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("text_quality", // stopword-ratio / diversity quality scoring
      (s, d) => docs(s, d).select(
          col("doc_id"),
          TextOps.stopwordRatio(col("text"), TextOps.StopwordsEn).as("stopword_ratio"),
          TextOps.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ($enList))) AS DOUBLE)
              |    / len(string_split(text, ' ')) AS stopword_ratio,
              |  (CAST(len(list_filter(string_split(text, ' '), t -> t IN ($enList))) AS DOUBLE)
              |     / len(string_split(text, ' '))
              |   + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              |     / len(string_split(text, ' '))
              |   + CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 500
              |          THEN 1.0 ELSE 0.5 END) / 3.0 AS quality
              |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("quality_filter_decision", // the composed C4/Gopher-style corpus
      // filter: every per-doc signal (token count bounds, mean token
      // length, stopword ratio, type-token ratio) evaluates in ONE
      // zero-shuffle projection, emitting the keep flag plus per-rule
      // booleans so the drop REASON survives for pipeline audits.
      (s, d) => {
        val t = col("text")
        val rLen = TextOps.nTokens(t).between(20, 2000)
        val rTok = TextOps.meanTokenLen(t).between(3.0, 12.0)
        val rStop = TextOps.stopwordRatio(t, TextOps.StopwordsEn) >= 0.05
        val rTtr = TextOps.typeTokenRatio(t) >= 0.2
        docs(s, d).select(col("doc_id"),
            rLen.cast("int").as("ok_len"),
            rTok.cast("int").as("ok_tok_len"),
            rStop.cast("int").as("ok_stopwords"),
            rTtr.cast("int").as("ok_ttr"),
            (rLen && rTok && rStop && rTtr).cast("int").as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH sig AS (
              |  SELECT doc_id,
              |    len(string_split(text, ' ')) AS ntok,
              |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
              |      / len(string_split(text, ' ')) AS mtl,
              |    CAST(len(list_filter(string_split(text, ' '), t -> t IN ($enList))) AS DOUBLE)
              |      / len(string_split(text, ' ')) AS stopr,
              |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              |      / len(string_split(text, ' ')) AS ttr
              |  FROM documents)
              |SELECT doc_id,
              |  CASE WHEN ntok BETWEEN 20 AND 2000 THEN 1 ELSE 0 END AS ok_len,
              |  CASE WHEN mtl BETWEEN 3.0 AND 12.0 THEN 1 ELSE 0 END AS ok_tok_len,
              |  CASE WHEN stopr >= 0.05 THEN 1 ELSE 0 END AS ok_stopwords,
              |  CASE WHEN ttr >= 0.2 THEN 1 ELSE 0 END AS ok_ttr,
              |  CASE WHEN ntok BETWEEN 20 AND 2000 AND mtl BETWEEN 3.0 AND 12.0
              |        AND stopr >= 0.05 AND ttr >= 0.2 THEN 1 ELSE 0 END AS keep
              |FROM sig ORDER BY doc_id""".stripMargin)),

    Q("corpus_ngram_counts", // corpus-level n-gram frequency table
      // (vocabulary/LM preprocessing): every 3-gram occurrence counts
      // (no per-doc distinct), one partial-agg shuffle on the shingle,
      // deterministic top-20 by (count desc, shingle asc).
      (s, d) => docs(s, d)
        // materialize the token array BEFORE the shingle lambda — the
        // HOF would otherwise re-split the text once per element
        // (the shinglesFromTokens O(tokens²) pitfall)
        .select(TextOps.tokens(col("text")).as("__ts"))
        .select(explode(TextOps.shinglesFromTokens(col("__ts"), 3)).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("shingle").asc)
        .limit(20),
      Some("""SELECT shingle, COUNT(*) AS n FROM (
             |  SELECT unnest(list_transform(range(1, len(ts) - 1),
             |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
             |  FROM (SELECT string_split(text, ' ') AS ts FROM documents))
             |GROUP BY shingle ORDER BY n DESC, shingle ASC LIMIT 20""".stripMargin)),

    Q("text_langid", // marker-stopword language ID vs the labeled column
      // (tokens → one-pass score struct → argmax, each stage projected)
      (s, d) => docs(s, d)
        .select(col("doc_id"), col("lang"),
          TextOps.tokens(col("text")).as("__ts"))
        .select(col("doc_id"), col("lang"),
          TextOps.langScoresFromTokens(col("__ts")).as("__ls"))
        .select(col("doc_id"), col("lang"),
          TextOps.langIdFromScores(col("__ls")).as("predicted"))
        .orderBy(col("doc_id")),
      Some {
        val scores = TextOps.LangMarkers.map { case (code, ms) =>
          val list = ms.map(m => s"'$m'").mkString(", ")
          s"len(list_filter(string_split(text, ' '), t -> t IN ($list))) AS s_$code"
        }.mkString(",\n    ")
        val codes = TextOps.LangMarkers.map(_._1)
        val best = s"GREATEST(${codes.map(c => s"s_$c").mkString(", ")})"
        val cases = codes.map(c => s"WHEN s_$c = $best THEN '$c'").mkString(" ")
        s"""SELECT doc_id, lang,
           |  CASE WHEN $best = 0 THEN 'und' $cases END AS predicted
           |FROM (SELECT doc_id, lang,
           |    $scores
           |  FROM documents)
           |ORDER BY doc_id""".stripMargin
      }),

    Q("text_fingerprint", // md5-derived 32-bit doc fingerprints
      (s, d) => docs(s, d).select(col("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"),
          TextOps.canonicalFingerprint(col("text")).as("fp_canonical"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  ${sqlHash32("text")} AS fp,
              |  ${sqlHash32("trim(regexp_replace(lower(text), ' +', ' ', 'g'))")} AS fp_canonical
              |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("dedup_exact", // hash-groupBy exact dedup groups
      (s, d) => DedupOps.exactGroups(docs(s, d), "doc_id", "text")
        .orderBy(col("content_hash")),
      Some("""SELECT md5(text) AS content_hash, MIN(doc_id) AS representative,
             |  COUNT(*) AS group_size
             |FROM documents GROUP BY md5(text)
             |ORDER BY content_hash""".stripMargin)),

    Q("dedup_exact_substring", // exact-substring dedup flags (Lee et
      // al. 2022 deduplicate-text-datasets): per doc, the maximal
      // coalesced spans of ≥10-token windows occurring more than once
      // anywhere in the corpus. Linear: groupBy the 128-bit window key,
      // semi-join back, one gaps-and-islands window per doc.
      (s, d) => {
        val spans = DedupOps.exactSubstringSpans(docs(s, d),
          "doc_id", "text", minRun = 10)
        val perDoc = spans.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("dup_spans"),
            sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
        // "full" (≡ left here: perDoc keys ⊆ docs) so Bench's count()
        // cannot eliminate the join — a LEFT join to an Aggregate on
        // the join key is provably non-duplicating, and Catalyst then
        // drops the entire dedup computation from a count-only plan
        // (measured: 0.2 s phantom vs the real 35 s at sf10)
        docs(s, d).select(col("doc_id"),
            TextOps.nTokens(col("text")).as("n_tokens"))
          .join(perDoc, Seq("doc_id"), "full")
          .select(col("doc_id"),
            coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
            coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
            col("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $posGramSql,
              |dup AS MATERIALIZED (
              |  SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
              |hits AS MATERIALIZED (
              |  SELECT doc_id, pos FROM g
              |  WHERE gram IN (SELECT gram FROM dup)),
              |isl AS MATERIALIZED (
              |  SELECT doc_id, pos,
              |    SUM(CASE WHEN pos - prev > 10 THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY doc_id ORDER BY pos) AS i
              |  FROM (SELECT doc_id, pos,
              |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
              |        FROM hits)),
              |spans AS MATERIALIZED (
              |  SELECT doc_id, min(pos) AS s, max(pos) + 9 AS e
              |  FROM isl GROUP BY doc_id, i),
              |agg AS (SELECT doc_id, count(*) AS dup_spans,
              |          CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
              |        FROM spans GROUP BY doc_id)
              |SELECT d.doc_id,
              |  COALESCE(a.dup_spans, 0) AS dup_spans,
              |  COALESCE(a.dup_tokens, 0) AS dup_tokens,
              |  CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens
              |FROM documents d LEFT JOIN agg a USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin)),

    Q("dedup_exact_substring_trim", // the trim pass: every duplicated
      // span removed (ALL occurrences), document reassembled from the
      // kept tokens in the array domain — only span lists shuffle.
      (s, d) => DedupOps.trimExactSubstrings(docs(s, d),
          "doc_id", "text", minRun = 10)
        .orderBy(col("doc_id")),
      Some(s"""WITH $posGramSql,
              |dup AS MATERIALIZED (
              |  SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
              |hits AS MATERIALIZED (
              |  SELECT doc_id, pos FROM g
              |  WHERE gram IN (SELECT gram FROM dup)),
              |isl AS MATERIALIZED (
              |  SELECT doc_id, pos,
              |    SUM(CASE WHEN pos - prev > 10 THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY doc_id ORDER BY pos) AS i
              |  FROM (SELECT doc_id, pos,
              |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
              |        FROM hits)),
              |spans AS MATERIALIZED (
              |  SELECT doc_id, min(pos) AS s, max(pos) + 9 AS e
              |  FROM isl GROUP BY doc_id, i),
              |kept AS (
              |  SELECT t.doc_id, t.pos, t.tok FROM toks t
              |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
              |    WHERE sp.doc_id = t.doc_id AND t.pos BETWEEN sp.s AND sp.e)),
              |ag AS (SELECT doc_id,
              |         string_agg(tok, ' ' ORDER BY pos) AS text_trimmed,
              |         CAST(count(*) AS INT) AS n_kept
              |       FROM kept GROUP BY doc_id)
              |SELECT d.doc_id,
              |  COALESCE(a.text_trimmed, '') AS text_trimmed,
              |  COALESCE(a.n_kept, 0) AS n_kept
              |FROM documents d LEFT JOIN ag a USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin)),

    Q("dedup_exact_substring_pairs", // doc pairs sharing a ≥10-token
      // contiguous run + the LONGEST shared run length: matched windows
      // equi-join on the window key (guarded by the Σc·(c−1)/2
      // fail-fast estimate), runs coalesce along (pos_a − pos_b)
      // diagonals.
      (s, d) => DedupOps.exactSubstringPairs(docs(s, d),
          "doc_id", "text", minRun = 10)
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $posGramSql,
              |pairs AS MATERIALIZED (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |    a.pos AS pa, a.pos - b.pos AS diag
              |  FROM g a JOIN g b
              |    ON a.gram = b.gram AND a.doc_id < b.doc_id),
              |runs AS MATERIALIZED (
              |  SELECT id_a, id_b, diag, pa,
              |    SUM(CASE WHEN pa - prev > 1 THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY id_a, id_b, diag ORDER BY pa) AS isl
              |  FROM (SELECT id_a, id_b, diag, pa,
              |          lag(pa) OVER (PARTITION BY id_a, id_b, diag
              |                        ORDER BY pa) AS prev
              |        FROM pairs)),
              |rl AS (SELECT id_a, id_b, count(*) + 9 AS run
              |       FROM runs GROUP BY id_a, id_b, diag, isl)
              |SELECT id_a, id_b, CAST(max(run) AS BIGINT) AS max_run_tokens
              |FROM rl GROUP BY id_a, id_b
              |ORDER BY id_a, id_b""".stripMargin)),

    Q("dedup_ngram_jaccard", // 3-gram shingle Jaccard pairs (≥2 shared)
      (s, d) => DedupOps.jaccardPairs(docs(s, d), "doc_id", "text",
          n = 3, threshold = 0.0)
        .filter(col("n_inter") >= 2)
        .select(col("id1"), col("id2"), col("n_inter"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id1"), col("id2")),
      Some(s"""WITH sh AS ($shingleSqlDistinct),
              |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
              |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY a.doc_id, b.doc_id)
              |SELECT id1, id2, n_inter,
              |  ROUND(CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter), 6) AS jaccard
              |FROM inter
              |JOIN sizes s1 ON s1.doc_id = id1
              |JOIN sizes s2 ON s2.doc_id = id2
              |WHERE n_inter >= 2
              |ORDER BY id1, id2""".stripMargin)),

    Q("dedup_ngram_jaccard_capped", // the 100 TB skew-guard variant:
      // shingles in > 3 docs are stop-shingles dropped BEFORE the
      // equi-join (hot-key n² blowup guard); Jaccard over the retained
      // sets, oracle recomputes the same cap.
      (s, d) => DedupOps.jaccardPairs(docs(s, d), "doc_id", "text",
          n = 3, threshold = 0.0, maxDocFreq = Some(3))
        .filter(col("n_inter") >= 2)
        .select(col("id1"), col("id2"), col("n_inter"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id1"), col("id2")),
      Some(s"""WITH sh0 AS ($shingleSqlDistinct),
              |keep AS (SELECT shingle FROM sh0 GROUP BY shingle
              |         HAVING COUNT(*) <= 3),
              |sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
              |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
              |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY a.doc_id, b.doc_id)
              |SELECT id1, id2, n_inter,
              |  ROUND(CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter), 6) AS jaccard
              |FROM inter
              |JOIN sizes s1 ON s1.doc_id = id1
              |JOIN sizes s2 ON s2.doc_id = id2
              |WHERE n_inter >= 2
              |ORDER BY id1, id2""".stripMargin)),

    Q("mix_sampling_plan", // dataset-mixture sampling: given target
      // per-source weights and a global token budget (40% of corpus,
      // n_chars as the token proxy; src0-4 upweighted 3×), compute each
      // source's keep-rate rate_s = min(1, T·w_s/(Σw·tok_s)) and take
      // the deterministic md5-hash sample. Plan shape: ONE profiling
      // aggregate (tiny result) → broadcast rates back → one filter
      // scan + final rollup; the corpus is scanned twice, shuffled on
      // nothing but the per-source rollup key.
      (s, d) => {
        val hot = Seq("src0", "src1", "src2", "src3", "src4")
        val doc0 = docs(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        val w = when(col("source").isin(hot: _*), 3.0).otherwise(1.0)
        val stats = doc0.groupBy(col("source"))
          .agg(sum(col("n_chars")).as("tok_s")).withColumn("w", w)
        val tot = stats.agg(sum(col("tok_s")).cast("double").as("tok_total"),
          sum(col("w")).as("w_sum"))
        val rates = stats.crossJoin(broadcast(tot)).select(col("source"),
          least(lit(1.0), lit(0.4) * col("tok_total") * col("w") /
            (col("w_sum") * col("tok_s").cast("double"))).as("rate"))
        val hv = Tables.hashVal32(concat(col("doc_id").cast("string"), lit("_mix")))
        doc0.join(broadcast(rates), "source")
          .filter((hv % 10000).cast("double") < col("rate") * 10000)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("tok_kept"),
            round(min(col("rate")), 6).as("rate"))
          .orderBy(col("source"))
      },
      Some {
        val hv = Tables.hashVal32Sql("CAST(doc_id AS VARCHAR) || '_mix'")
        s"""WITH stats AS (
           |  SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS tok_s,
           |    CASE WHEN source IN ('src0','src1','src2','src3','src4')
           |         THEN 3.0 ELSE 1.0 END AS w
           |  FROM documents GROUP BY source),
           |tot AS (SELECT CAST(SUM(tok_s) AS DOUBLE) AS tok_total,
           |               SUM(w) AS w_sum FROM stats),
           |rates AS (SELECT source,
           |    LEAST(1.0, 0.4 * tok_total * w / (w_sum * tok_s)) AS rate
           |  FROM stats CROSS JOIN tot)
           |SELECT source, COUNT(*) AS n_kept,
           |  CAST(SUM(n_chars) AS BIGINT) AS tok_kept,
           |  ROUND(MIN(rate), 6) AS rate
           |FROM documents JOIN rates USING (source)
           |WHERE CAST($hv % 10000 AS DOUBLE) < rate * 10000
           |GROUP BY source ORDER BY source""".stripMargin
      }),

    Q("decontaminate_ngram", // benchmark-overlap decontamination (the
      // GPT-3 appendix-C shape): corpus docs sharing any 5-gram with a
      // deterministic pseudo-eval set (doc_id % 10 = 0) are flagged.
      // Benchmark shingles broadcast; the corpus never shuffles on text.
      (s, d) => {
        val all0 = docs(s, d)
        val bench = all0.filter(col("doc_id") % 10 === 0)
        val corpus = all0.filter(col("doc_id") % 10 =!= 0)
        DedupOps.contamination(corpus, bench, "doc_id", "text", n = 5)
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |sh AS (SELECT DISTINCT doc_id,
             |    unnest(list_transform(range(1, len(ts) - 3),
             |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
             |           ts[i+3] || ' ' || ts[i+4])) AS shingle
             |  FROM t WHERE len(ts) >= 5),
             |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
             |corpus AS (SELECT * FROM sh WHERE doc_id % 10 <> 0)
             |SELECT doc_id, COUNT(*) AS n_hits, MIN(shingle) AS first_hit
             |FROM corpus JOIN bench USING (shingle)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("text_repetition", // Gopher/C4-style repetition quality signals
      // (Rae et al. 2021 "Scaling Language Models" §A1.1; Raffel et al.
      // 2020 C4): top-2/3-gram mass fraction + duplicate-5-gram
      // fraction per document. Pure per-row array expressions — ZERO
      // shuffle at any corpus size; token/gram arrays are projected
      // into real columns first (HOFs run interpreted, see
      // TextOps.shinglesFromTokens).
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"),
          TextOps.tokens(col("text")).as("ts"))
        // top-gram mass = max multiplicity / n. Max multiplicity is the
        // longest equal-run in the SORTED gram array: a native O(n log n)
        // array_sort + ONE O(n) interpreted fold — the first cut counted
        // each distinct gram with a nested filter-inside-transform
        // lambda, O(distinct·n) interpreted string compares per doc,
        // which honest (noop-sink) timing exposed as 54 s of the sf1m
        // sweep on mutated long docs.
        val withG = base.select(col("doc_id"),
          array_sort(TextOps.shinglesFromTokens(col("ts"), 2)).as("g2"),
          array_sort(TextOps.shinglesFromTokens(col("ts"), 3)).as("g3"),
          TextOps.shinglesFromTokens(col("ts"), 5).as("g5"))
        def topFrac(g: Column): Column = {
          val run = aggregate(
            sequence(lit(2), size(g)),
            struct(lit(1).as("cur"), lit(1).as("best")),
            (acc, i) => {
              val cur = when(
                element_at(g, i.cast("int")) ===
                  element_at(g, (i - 1).cast("int")),
                acc.getField("cur") + 1).otherwise(lit(1))
              struct(cur.as("cur"),
                greatest(acc.getField("best"), cur).as("best"))
            },
            acc => acc.getField("best"))
          // size(null) is null, so a NULL gram array (null text) falls
          // through every `when` — coalesce to the oracle's 0.0
          coalesce(when(size(g) === 0, 0.0)
            .when(size(g) === 1, 1.0)
            .otherwise(run.cast("double") / size(g)), lit(0.0))
        }
        def dupFrac(g: Column): Column = when(size(g) > 0,
          (size(g) - size(array_distinct(g))).cast("double") / size(g))
          .otherwise(0.0)
        withG.select(col("doc_id"),
            topFrac(col("g2")).as("top2_frac"),
            topFrac(col("g3")).as("top3_frac"),
            dupFrac(col("g5")).as("dup5_frac"))
          .orderBy(col("doc_id"))
      },
      Some {
        def gramsSql(n: Int): String = {
          val parts = (0 until n).map(k =>
            if (k == 0) "ts[i]" else s"ts[i+$k]").mkString(" || ' ' || ")
          val hi = if (n == 2) "len(ts)" else s"len(ts) - ${n - 2}"
          s"CASE WHEN len(ts) >= $n THEN list_transform(range(1, $hi), i -> $parts) " +
            "ELSE CAST([] AS VARCHAR[]) END"
        }
        def topFracSql(g: String): String =
          s"CASE WHEN len($g) > 0 THEN CAST(list_max(list_transform(list_distinct($g), " +
            s"d -> len(list_filter($g, x -> x = d)))) AS DOUBLE) / len($g) ELSE 0.0 END"
        def dupFracSql(g: String): String =
          s"CASE WHEN len($g) > 0 THEN CAST(len($g) - len(list_distinct($g)) AS DOUBLE) " +
            s"/ len($g) ELSE 0.0 END"
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
           |g AS (SELECT doc_id, ${gramsSql(2)} AS g2, ${gramsSql(3)} AS g3,
           |  ${gramsSql(5)} AS g5 FROM t)
           |SELECT doc_id, ${topFracSql("g2")} AS top2_frac,
           |  ${topFracSql("g3")} AS top3_frac, ${dupFracSql("g5")} AS dup5_frac
           |FROM g ORDER BY doc_id""".stripMargin
      }),

    Q("text_normalize", // corpus normalization (lowercase, control→space,
      // whitespace collapse) — the standard pre-dedup cleanup pass;
      // verified via md5 of the normalized text per doc.
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          md5(TextOps.normalizeText(col("text"))).as("norm_md5"),
          length(TextOps.normalizeText(col("text"))).as("norm_len"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  md5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
             |    '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g'))) AS norm_md5,
             |  LENGTH(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
             |    '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g'))) AS norm_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("text_pii_redact", // PII scrubbing (C4/Dolma-style corpus cleanup):
      // emails / IPv4 / phone-shaped digit runs → typed placeholders.
      // Codegen'd regexp chain, zero shuffle; RE2-safe patterns keep the
      // DuckDB oracle byte-identical. Verified via md5 + changed flag so
      // the full redacted text never ships to the compare.
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          md5(TextOps.redactPii(col("text"))).as("redacted_md5"),
          (TextOps.redactPii(col("text")) =!= col("text"))
            .cast("int").as("changed"))
        .orderBy(col("doc_id")),
      Some("""WITH r AS (
             |  SELECT doc_id, text,
             |    REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             |      '\b\+?\d{3}[-. ]?\d{3}[-. ]?\d{4}\b', '<PHONE>', 'g') AS red
             |  FROM documents)
             |SELECT doc_id, md5(red) AS redacted_md5,
             |  CASE WHEN red <> text THEN 1 ELSE 0 END AS changed
             |FROM r ORDER BY doc_id""".stripMargin)),

    Q("dedup_canonicalize", // near-dup clustering + canonical selection
      // (the C4/RefinedWeb corpus-dedup finisher): Jaccard>=0.3 pairs
      // over doc-frequency-capped shingles (stop-shingles in > 50 docs
      // dropped before the equi-join — the hot-key guard) → connected
      // components (large-star/small-star, O(log n) rounds) → keep the
      // smallest doc_id per component. Oracle recomputes the same cap
      // and the same components with a recursive CTE (labels are min-id
      // either way).
      (s, d) => {
        val dd = docs(s, d)
        val pairs = DedupOps.jaccardPairs(dd, "doc_id", "text", 3, 0.3,
          maxDocFreq = Some(50))
        DedupOps.canonicalize(dd, pairs, "doc_id")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE sh0 AS ($shingleSqlDistinct),
              |keep0 AS (SELECT shingle FROM sh0 GROUP BY shingle
              |          HAVING COUNT(*) <= 50),
              |sh AS (SELECT sh0.* FROM sh0 JOIN keep0 USING (shingle)),
              |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
              |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY a.doc_id, b.doc_id),
              |pairs AS (
              |  SELECT id1, id2 FROM inter
              |  JOIN sizes s1 ON s1.doc_id = id1
              |  JOIN sizes s2 ON s2.doc_id = id2
              |  WHERE CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter) >= 0.3),
              |edges AS (SELECT id1 AS u, id2 AS v FROM pairs
              |          UNION SELECT id2, id1 FROM pairs),
              |reach(node, label) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node)
              |SELECT node AS doc_id, MIN(label) AS canonical_id,
              |  CAST(CASE WHEN node = MIN(label) THEN 1 ELSE 0 END AS INT) AS keep
              |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin)),

    Q("dedup_keep_best", // near-dup retention by QUALITY: same clusters
      // as dedup_canonicalize, but each component keeps its
      // highest-quality member (ties → smallest doc_id) instead of the
      // smallest id — the RefinedWeb-style "keep the best duplicate"
      // policy. The per-cluster argmax is a window over cluster labels
      // (parallel per component at any scale); quality is rounded to 6
      // decimals BEFORE ranking on both engines.
      (s, d) => {
        val dd = docs(s, d)
        val pairs = DedupOps.jaccardPairs(dd, "doc_id", "text", 3, 0.3,
          maxDocFreq = Some(50))
        val clusters = DedupOps.canonicalize(dd, pairs, "doc_id")
        val scored = dd.select(col("doc_id"),
          round(TextOps.qualityScore(col("text")), 6).as("quality"))
        val w = Window.partitionBy(col("canonical_id"))
          .orderBy(col("quality").desc, col("doc_id").asc)
        clusters.join(scored, "doc_id")
          .withColumn("keep_best", (row_number().over(w) === 1).cast("int"))
          .select(col("doc_id"), col("canonical_id"), col("quality"),
            col("keep_best"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE sh0 AS ($shingleSqlDistinct),
              |keep0 AS (SELECT shingle FROM sh0 GROUP BY shingle
              |          HAVING COUNT(*) <= 50),
              |sh AS (SELECT sh0.* FROM sh0 JOIN keep0 USING (shingle)),
              |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
              |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY a.doc_id, b.doc_id),
              |pairs AS (
              |  SELECT id1, id2 FROM inter
              |  JOIN sizes s1 ON s1.doc_id = id1
              |  JOIN sizes s2 ON s2.doc_id = id2
              |  WHERE CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter) >= 0.3),
              |edges AS (SELECT id1 AS u, id2 AS v FROM pairs
              |          UNION SELECT id2, id1 FROM pairs),
              |reach(node, label) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node),
              |clusters AS (
              |  SELECT node AS doc_id, MIN(label) AS canonical_id
              |  FROM reach GROUP BY node),
              |scored AS (
              |  SELECT doc_id,
              |    ROUND((CAST(len(list_filter(string_split(text, ' '),
              |        t -> t IN ($enList))) AS DOUBLE)
              |       / len(string_split(text, ' '))
              |     + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              |       / len(string_split(text, ' '))
              |     + CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 500
              |            THEN 1.0 ELSE 0.5 END) / 3.0, 6) AS quality
              |  FROM documents)
              |SELECT doc_id, canonical_id, quality,
              |  CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY canonical_id
              |      ORDER BY quality DESC, doc_id ASC) = 1
              |    THEN 1 ELSE 0 END AS INT) AS keep_best
              |FROM clusters JOIN scored USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    Q("pipeline_corpus_curation", // the END-TO-END curation pipeline as
      // one declarative plan: per language, documents flow through the
      // C4/Gopher quality gate → exact text dedup (min doc id per
      // distinct text) → near-dup canonicalization (the Jaccard + CC
      // finisher over the surviving docs) → the 256-token packing plan;
      // the audit row per language carries every stage's count, the
      // surviving token mass, and the training bins it fills. Each
      // stage is the already-gated operator; what this query verifies
      // is the COMPOSITION (counts thread through the same rows both
      // engines end to end).
      (s, d) => {
        val dd = docs(s, d)
        val quality = dd.filter(TextOps.keepDecision(col("text")))
        // exact dedup: keep the smallest doc_id per distinct text
        val exactKeep = quality
          .withColumn("__rk", row_number().over(
            Window.partitionBy(col("text")).orderBy(col("doc_id"))))
          .filter(col("__rk") === 1).drop("__rk")
        // near-dup canonicalization over the exact-kept survivors
        val pairs = DedupOps.jaccardPairs(exactKeep, "doc_id", "text", 3,
          0.3, maxDocFreq = Some(50))
        val canon = DedupOps.canonicalize(exactKeep, pairs, "doc_id")
          .filter(col("keep") === 1).select(col("doc_id"))
        // Stage counts from TWO corpus passes instead of four: pass 1 =
        // one conditional aggregation over the raw docs (n_raw +
        // n_quality per lang); pass 2 = the exact-kept survivors with a
        // canon membership flag (n_exact, and n_final/total_tokens as
        // conditional aggregates). Same counts, same left-join NULL
        // semantics (a lang with 0 quality docs has no exactKeep rows —
        // the left join keeps its NULLs for the COALESCE below).
        val kept = exactKeep.join(canon.withColumn("__c", lit(1)),
            Seq("doc_id"), "left")
          .select(col("lang"), col("__c"),
            TextOps.nTokens(col("text")).cast("long").as("n_tok"))
        val stages = dd.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_raw"),
            count(when(TextOps.keepDecision(col("text")), 1))
              .as("n_quality0"))
          .select(col("lang"), col("n_raw"),
            when(col("n_quality0") > 0, col("n_quality0")).as("n_quality"))
          .join(kept.groupBy(col("lang"))
            .agg(count(lit(1)).as("n_exact"),
              count(when(col("__c") === 1, 1)).as("n_final0"),
              sum(when(col("__c") === 1, col("n_tok"))).as("total_tokens0"))
            .select(col("lang"), col("n_exact"),
              when(col("n_final0") > 0, col("n_final0")).as("n_final"),
              col("total_tokens0").as("total_tokens")), Seq("lang"), "left")
        stages.select(col("lang"), col("n_raw"),
            coalesce(col("n_quality"), lit(0L)).as("n_quality"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"),
            coalesce(col("n_final"), lit(0L)).as("n_final"),
            coalesce(col("total_tokens"), lit(0L)).as("total_tokens"),
            when(coalesce(col("total_tokens"), lit(0L)) > 0,
              floor((col("total_tokens") - 1) / 256) + 1)
              .otherwise(0L).as("n_bins"))
          .orderBy(col("lang"))
      },
      Some {
        val keepSql =
          s"""len(string_split(text, ' ')) BETWEEN 20 AND 2000
             |    AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
             |      / len(string_split(text, ' ')) BETWEEN 3.0 AND 12.0
             |    AND CAST(len(list_filter(string_split(text, ' '),
             |        t -> t IN ($enList))) AS DOUBLE)
             |      / len(string_split(text, ' ')) >= 0.05
             |    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             |      / len(string_split(text, ' ')) >= 0.2""".stripMargin
        s"""WITH RECURSIVE quality AS MATERIALIZED (
           |  SELECT doc_id, lang, text FROM documents
           |  WHERE $keepSql),
           |exact AS MATERIALIZED (
           |  SELECT doc_id, lang, text FROM (
           |    SELECT doc_id, lang, text, ROW_NUMBER() OVER (
           |      PARTITION BY text ORDER BY doc_id) AS rk
           |    FROM quality) WHERE rk = 1),
           |sh0 AS (
           |  SELECT DISTINCT doc_id, shingle FROM (
           |    SELECT doc_id,
           |      unnest(list_transform(range(1, len(ts) - 1),
           |        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
           |    FROM (SELECT doc_id, string_split(text, ' ') AS ts
           |          FROM exact))),
           |keep0 AS (SELECT shingle FROM sh0 GROUP BY shingle
           |          HAVING COUNT(*) <= 50),
           |sh AS (SELECT sh0.* FROM sh0 JOIN keep0 USING (shingle)),
           |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
           |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           |  GROUP BY a.doc_id, b.doc_id),
           |prs AS (
           |  SELECT id1, id2 FROM inter
           |  JOIN sizes s1 ON s1.doc_id = id1
           |  JOIN sizes s2 ON s2.doc_id = id2
           |  WHERE CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter) >= 0.3),
           |edges AS (SELECT id1 AS u, id2 AS v FROM prs
           |          UNION SELECT id2, id1 FROM prs),
           |reach(node, label) AS (
           |  SELECT doc_id, doc_id FROM exact
           |  UNION
           |  SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node),
           |canon AS MATERIALIZED (
           |  SELECT node AS doc_id FROM reach GROUP BY node
           |  HAVING node = MIN(label)),
           |kept AS MATERIALIZED (
           |  SELECT e.lang, e.doc_id,
           |    CAST(len(string_split(e.text, ' ')) AS BIGINT) AS n_tok
           |  FROM exact e JOIN canon c ON c.doc_id = e.doc_id)
           |SELECT d.lang, COUNT(*) AS n_raw,
           |  COALESCE(q.n, 0) AS n_quality,
           |  COALESCE(x.n, 0) AS n_exact,
           |  COALESCE(k.n, 0) AS n_final,
           |  COALESCE(k.tok, 0) AS total_tokens,
           |  CASE WHEN COALESCE(k.tok, 0) > 0
           |    THEN CAST(FLOOR((k.tok - 1) / 256) AS BIGINT) + 1
           |    ELSE 0 END AS n_bins
           |FROM documents d
           |LEFT JOIN (SELECT lang, COUNT(*) AS n FROM quality GROUP BY lang) q
           |  ON q.lang = d.lang
           |LEFT JOIN (SELECT lang, COUNT(*) AS n FROM exact GROUP BY lang) x
           |  ON x.lang = d.lang
           |LEFT JOIN (SELECT lang, COUNT(*) AS n,
           |             CAST(SUM(n_tok) AS BIGINT) AS tok
           |           FROM kept GROUP BY lang) k
           |  ON k.lang = d.lang
           |GROUP BY d.lang, q.n, x.n, k.n, k.tok
           |ORDER BY d.lang""".stripMargin
      }),

    Q("dedup_edit_distance", // fuzzy-match finisher: MinHash band
      // candidates re-scored with EXACT Levenshtein distance and kept
      // under a relative threshold (dist ≤ 20% of the longer text) —
      // the high-precision pass after the probabilistic screen. Both
      // engines ship integer levenshtein, so the score is exact; the
      // expensive O(len²) metric runs only on the candidate pairs,
      // never the corpus cross product.
      (s, d) => {
        val dd = docs(s, d)
        val cand = DedupOps.minhashCandidates(
          DedupOps.minhashSignatures(dd, "doc_id", "text", 3),
          "doc_id", bands = 8, rows = 2)
        // three per-pair cost cuts with UNCHANGED kept rows/values:
        //  - equal texts (the dominant candidate class in any corpus
        //    with exact dups) short-circuit to 0 via an O(len) compare
        //    instead of the O(len²) DP;
        //  - the DP itself runs BANDED with threshold = ⌊max_len/5⌋
        //    (catalyst Levenshtein's 3-arg form): dist ≤ ⌊L/5⌋ ⟺
        //    dist·5 ≤ L for integers, and above-threshold pairs return
        //    −1 — exactly the rows the old filter dropped;
        //  - the DP projection is wrapped in EvalOnce: without it,
        //    predicate pushdown folds the kernel into the text-join's
        //    post-condition and it re-runs per candidate row off the
        //    codegen path (measured 46 s vs 1.4 s on the sf1 mutated
        //    replica, where candidates are REAL near-dups instead of
        //    short-circuiting twins).
        // The explicit repartition keeps the DP spread across cores:
        // the pair table is small in BYTES, so AQE's coalescing would
        // funnel the CPU-bound scoring into one task (cheap-bytes/
        // expensive-rows); keyed on the pair ids it is the same
        // partitioning the dedup aggregate already produced.
        import org.apache.spark.sql.graftbridge.SqlBridge
        val maxLen = greatest(length(col("t1")), length(col("t2")))
        val banded = SqlBridge.column(
          org.apache.spark.sql.catalyst.expressions.Levenshtein(
            SqlBridge.expression(col("t1")), SqlBridge.expression(col("t2")),
            Some(SqlBridge.expression((maxLen / 5).cast("int")))))
        val survivors = cand
          .repartition(s.sparkContext.defaultParallelism,
            col("id1"), col("id2"))
          .join(dd.select(col("doc_id").as("id1"), col("text").as("t1")), "id1")
          .join(dd.select(col("doc_id").as("id2"), col("text").as("t2")), "id2")
          .select(col("id1"), col("id2"),
            graft.functions.BarrierExpr.evalOnce(
              when(col("t1") === col("t2"), 0).otherwise(banded))
              .as("edit_dist"),
            maxLen.as("max_len"))
          .filter(col("edit_dist") >= 0 && col("edit_dist") * 5 <= col("max_len"))
          // persist BEFORE the global sort (the dedup_incremental_batch
          // cache pattern): RangePartitioner's boundary-sampling pass
          // re-executes its child, which here would re-run the whole
          // signature+join+DP pipeline a second time; the survivor set
          // is pair-volume bound and tiny next to the work that made it
          .persist()
        survivors.orderBy(col("id1"), col("id2"))
      },
      Some {
        val p = DedupOps.MinhashP
        val h = sqlHash32("shingle")
        val mins = DedupOps.MinhashParams.zipWithIndex.map { case ((a, b), j) =>
          s"MIN(($h * $a + $b) % $p) AS m$j"
        }.mkString(",\n    ")
        val bandRows = (0 until 8).map { band =>
          val c1 = s"m${band * 2}"; val c2 = s"m${band * 2 + 1}"
          s"SELECT doc_id, $band AS band, CONCAT($c1, '_', $c2) AS sig FROM sig"
        }.mkString("\nUNION ALL\n")
        s"""WITH sh AS ($shingleSqlDistinct),
           |sig AS (
           |  SELECT doc_id,
           |    $mins
           |  FROM sh GROUP BY doc_id),
           |bands AS (
           |$bandRows),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
           |  FROM bands x JOIN bands y
           |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id)
           |SELECT id1, id2,
           |  CAST(levenshtein(d1.text, d2.text) AS INT) AS edit_dist,
           |  CAST(GREATEST(LENGTH(d1.text), LENGTH(d2.text)) AS INT)
           |    AS max_len
           |FROM cand
           |JOIN documents d1 ON d1.doc_id = id1
           |JOIN documents d2 ON d2.doc_id = id2
           |WHERE levenshtein(d1.text, d2.text) * 5
           |  <= GREATEST(LENGTH(d1.text), LENGTH(d2.text))
           |ORDER BY id1, id2""".stripMargin
      }),

    Q("dedup_incremental_batch", // daily-ingest dedup: a NEW batch
      // (doc_id % 5 = 0 here) screened against the EXISTING corpus by
      // MinHash band collision — the front-door filter a production
      // pipeline runs per ingest instead of re-deduping the world. Per
      // batch doc: how many of its 8 bands collide with the corpus, the
      // smallest colliding corpus doc, an intra-batch first-wins flag,
      // and keep = no corpus hit AND first in batch. Scale shape: band
      // rows equi-join on (band, sig) — the corpus side streams, the
      // batch side is the small one.
      (s, d) => {
        val bandsAll = DedupOps.minhashBandRows(
          DedupOps.minhashSignatures(docs(s, d), "doc_id", "text", 3),
          "doc_id", bands = 8, rows = 2).cache()
        val corpus = bandsAll.filter(col("doc_id") % 5 =!= 0)
        val batch = bandsAll.filter(col("doc_id") % 5 === 0)
        val corpusHits = batch
          .join(corpus.select(col("band"), col("sig"),
            col("doc_id").as("c_id")), Seq("band", "sig"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("band")).as("n_band_hits"),
            min(col("c_id")).as("dup_of0"))
        val earlier = batch.as("x")
          .join(batch.select(col("band"), col("sig"),
            col("doc_id").as("e_id")), Seq("band", "sig"))
          .filter(col("e_id") < col("doc_id"))
          .groupBy(col("doc_id")).agg(min(col("e_id")).as("first_dup"))
        batch.select(col("doc_id")).distinct()
          .join(corpusHits, Seq("doc_id"), "left")
          .join(earlier, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_band_hits"), lit(0L)).as("n_band_hits"),
            coalesce(col("dup_of0"), lit(-1L)).as("dup_of"),
            (col("n_band_hits").isNull && col("first_dup").isNull)
              .cast("int").as("keep"))
          .orderBy(col("doc_id"))
      },
      Some {
        val p = DedupOps.MinhashP
        val h = sqlHash32("shingle")
        val mins = DedupOps.MinhashParams.zipWithIndex.map { case ((a, b), j) =>
          s"MIN(($h * $a + $b) % $p) AS m$j"
        }.mkString(",\n    ")
        val bandRows = (0 until 8).map { band =>
          val c1 = s"m${band * 2}"; val c2 = s"m${band * 2 + 1}"
          s"SELECT doc_id, $band AS band, CONCAT($c1, '_', $c2) AS sig FROM sig"
        }.mkString("\nUNION ALL\n")
        s"""WITH sh AS ($shingleSqlDistinct),
           |sig AS (
           |  SELECT doc_id,
           |    $mins
           |  FROM sh GROUP BY doc_id),
           |bands AS (
           |$bandRows),
           |corpus AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
           |batch AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
           |hits AS (
           |  SELECT b.doc_id, COUNT(DISTINCT b.band) AS n_band_hits,
           |    MIN(c.doc_id) AS dup_of0
           |  FROM batch b JOIN corpus c
           |    ON c.band = b.band AND c.sig = b.sig
           |  GROUP BY b.doc_id),
           |earlier AS (
           |  SELECT b.doc_id, MIN(e.doc_id) AS first_dup
           |  FROM batch b JOIN batch e
           |    ON e.band = b.band AND e.sig = b.sig AND e.doc_id < b.doc_id
           |  GROUP BY b.doc_id)
           |SELECT d.doc_id,
           |  COALESCE(h.n_band_hits, 0) AS n_band_hits,
           |  COALESCE(h.dup_of0, -1) AS dup_of,
           |  CAST(CASE WHEN h.doc_id IS NULL AND e.doc_id IS NULL
           |    THEN 1 ELSE 0 END AS INT) AS keep
           |FROM (SELECT DISTINCT doc_id FROM batch) d
           |LEFT JOIN hits h ON h.doc_id = d.doc_id
           |LEFT JOIN earlier e ON e.doc_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin
      }),

    Q("dedup_minhash_lsh_fast", // scale-path MinHash: xxhash64 shingle
      // hashing (codegen-native) instead of oracle-portable md5 — same
      // banding. Oracle replays Spark's xxhash64 in pure DuckDB SQL via
      // the Xxh64Sql macro prelude (HUGEINT mod-2^64 arithmetic), so the
      // scale path is hash-gated, not rows-only. BENCH shows the
      // md5-vs-xxhash64 delta directly.
      (s, d) => DedupOps.minhashCandidates(
          DedupOps.minhashSignaturesFast(docs(s, d), "doc_id", "text", 3),
          "doc_id", bands = 8, rows = 2)
        .orderBy(col("id1"), col("id2")),
      Some {
        val p = DedupOps.MinhashP
        // hash each shingle ONCE in its own CTE (the 16 min-aggregates then
        // reuse the value — mirrors the Spark plan's single __h projection;
        // inlining xg_h32 16x would cost 16x the macro evaluation)
        val mins = DedupOps.MinhashParams.zipWithIndex.map { case ((a, b), j) =>
          s"MIN((h * $a + $b) % $p) AS m$j"
        }.mkString(",\n    ")
        val bandRows = (0 until 8).map { band =>
          val c1 = s"m${band * 2}"; val c2 = s"m${band * 2 + 1}"
          s"SELECT doc_id, $band AS band, CONCAT($c1, '_', $c2) AS sig FROM sig"
        }.mkString("\nUNION ALL\n")
        s"""${Xxh64Sql.prelude}
           |WITH sh AS ($shingleSqlDistinct),
           |shh AS (SELECT doc_id, ${Xxh64Sql.h32("shingle")} AS h FROM sh),
           |sig AS (
           |  SELECT doc_id,
           |    $mins
           |  FROM shh GROUP BY doc_id),
           |bands AS (
           |$bandRows)
           |SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
           |FROM bands x JOIN bands y
           |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
           |ORDER BY id1, id2""".stripMargin
      }),

    Q("dedup_minhash_lsh", // MinHash signatures + LSH band candidates
      (s, d) => DedupOps.minhashCandidates(
          DedupOps.minhashSignatures(docs(s, d), "doc_id", "text", 3),
          "doc_id", bands = 8, rows = 2)
        .orderBy(col("id1"), col("id2")),
      Some {
        val p = DedupOps.MinhashP
        val h = sqlHash32("shingle")
        val mins = DedupOps.MinhashParams.zipWithIndex.map { case ((a, b), j) =>
          s"MIN(($h * $a + $b) % $p) AS m$j"
        }.mkString(",\n    ")
        val bandRows = (0 until 8).map { band =>
          val c1 = s"m${band * 2}"; val c2 = s"m${band * 2 + 1}"
          s"SELECT doc_id, $band AS band, CONCAT($c1, '_', $c2) AS sig FROM sig"
        }.mkString("\nUNION ALL\n")
        s"""WITH sh AS ($shingleSqlDistinct),
           |sig AS (
           |  SELECT doc_id,
           |    $mins
           |  FROM sh GROUP BY doc_id),
           |bands AS (
           |$bandRows)
           |SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
           |FROM bands x JOIN bands y
           |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
           |ORDER BY id1, id2""".stripMargin
      }),

    Q("stream_dedup_minhash_bands", // streaming near-dup ingest filter:
      // per-row MinHash signatures (array exprs, no shuffle) → LSH band
      // buckets → dropDuplicates keyed state (the production front-door
      // filter) → distinct-bucket counts per band. Arrival-order
      // independent output; oracle = the batch signature aggregation.
      (s, d) => graft.streaming.StreamOps
        .streamingMinhashBandDedup(s, d, "stream_mh_band_sink")
        .orderBy(col("band")),
      Some {
        val p = DedupOps.MinhashP
        val h = sqlHash32("shingle")
        val mins = DedupOps.MinhashParams.zipWithIndex.map { case ((a, b), j) =>
          s"MIN(($h * $a + $b) % $p) AS m$j"
        }.mkString(",\n    ")
        val bandSelects = (0 until 8).map { band =>
          s"SELECT $band AS band, COUNT(DISTINCT CONCAT(m${band * 2}, '_', m${band * 2 + 1})) AS n_buckets FROM sig"
        }.mkString("\nUNION ALL\n")
        s"""WITH sh AS ($shingleSqlDistinct),
           |sig AS (
           |  SELECT doc_id,
           |    $mins
           |  FROM sh GROUP BY doc_id),
           |b AS (
           |$bandSelects)
           |SELECT band, n_buckets FROM b ORDER BY band""".stripMargin
      }),

    Q("stream_dedup_minhash_bands_fast", // production-rate variant of the
      // streaming band dedup: xxhash64 folded to 32 bits replaces the
      // interpreted per-shingle md5 (whole-stage-codegen native, the
      // same hasher as the batch scale twin dedup_minhash_lsh_fast).
      // Oracle = batch signature aggregation with the Xxh64Sql pure-SQL
      // xxhash64 replay; DedupSpec additionally pins stream ≡ batch.
      (s, d) => graft.streaming.StreamOps
        .streamingMinhashBandDedup(s, d, "stream_mh_band_fast_sink",
          fastHash = true)
        .orderBy(col("band")),
      Some {
        val p = DedupOps.MinhashP
        // single-evaluation hash CTE — see dedup_minhash_lsh_fast
        val mins = DedupOps.MinhashParams.zipWithIndex.map { case ((a, b), j) =>
          s"MIN((h * $a + $b) % $p) AS m$j"
        }.mkString(",\n    ")
        val bandSelects = (0 until 8).map { band =>
          s"SELECT $band AS band, COUNT(DISTINCT CONCAT(m${band * 2}, '_', m${band * 2 + 1})) AS n_buckets FROM sig"
        }.mkString("\nUNION ALL\n")
        s"""${Xxh64Sql.prelude}
           |WITH sh AS ($shingleSqlDistinct),
           |shh AS (SELECT doc_id, ${Xxh64Sql.h32("shingle")} AS h FROM sh),
           |sig AS (
           |  SELECT doc_id,
           |    $mins
           |  FROM shh GROUP BY doc_id),
           |b AS (
           |$bandSelects)
           |SELECT band, n_buckets FROM b ORDER BY band""".stripMargin
      }),

    Q("dedup_simhash", // 32-bit SimHash signatures per doc
      (s, d) => DedupOps.simhash(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some {
        val h = sqlHash32("t")
        val bitSums = (0 until 32).map { j =>
          s"SUM(((CAST(FLOOR(h / ${math.pow(2, j).toLong}) AS BIGINT) % 2) * 2 - 1)) AS b$j"
        }.mkString(",\n    ")
        val sig = (0 until 32).map { j =>
          s"CASE WHEN b$j > 0 THEN ${math.pow(2, j).toLong} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH tok AS (
           |  SELECT doc_id, $h AS h FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)),
           |agg AS (SELECT doc_id,
           |    $bitSums
           |  FROM tok GROUP BY doc_id)
           |SELECT doc_id, $sig AS simhash FROM agg ORDER BY doc_id""".stripMargin
      }),

    Q("dedup_simhash_pairs", // near-dup candidates within Hamming ≤ 3:
      // banded equi-join on signature bytes (pigeonhole-exact), no
      // all-pairs scan; oracle is the naive quadratic formulation.
      (s, d) => DedupOps.simhashPairs(
          DedupOps.simhash(docs(s, d), "doc_id", "text"), "doc_id", 3)
        .orderBy(col("id1"), col("id2")),
      Some {
        val h = sqlHash32("t")
        val bitSums = (0 until 32).map { j =>
          s"SUM(((CAST(FLOOR(h / ${math.pow(2, j).toLong}) AS BIGINT) % 2) * 2 - 1)) AS b$j"
        }.mkString(",\n    ")
        val sig = (0 until 32).map { j =>
          s"CASE WHEN b$j > 0 THEN ${math.pow(2, j).toLong} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH tok AS (
           |  SELECT doc_id, $h AS h FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)),
           |agg AS (SELECT doc_id,
           |    $bitSums
           |  FROM tok GROUP BY doc_id),
           |sig AS (SELECT doc_id, $sig AS simhash FROM agg)
           |SELECT a.doc_id AS id1, b.doc_id AS id2,
           |  bit_count(xor(a.simhash, b.simhash)) AS hamming
           |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
           |ORDER BY id1, id2""".stripMargin
      }),

    Q("multimodal_binary_meta", // binary payload plumbing + stub decode
      (s, d) => {
        val media = graft.multimodal.MultimodalOps.asMedia(
          docs(s, d), "doc_id", "text")
        graft.multimodal.MultimodalOps.decodeFeatures(s, media)
          .select(col("media_id"), col("width"), col("height"),
            col("n_frames"), col("n_bytes"))
          .orderBy(col("media_id"))
      },
      // Oracle mirrors the stub decode: payload = utf-8 bytes of text,
      // b0/b1 = first two byte values (ASCII fixture text).
      Some("""SELECT doc_id AS media_id,
             |  64 + (ascii(substring(text, 1, 1)) % 16) * 64 AS width,
             |  64 + (ascii(substring(text, 2, 1)) % 9) * 64 AS height,
             |  CAST(1 + octet_length(encode(text)) % 30 AS INT) AS n_frames,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
             |FROM documents ORDER BY media_id""".stripMargin)),

    Q("multimodal_resize", // aspect-preserving resize pass: stub pixels,
      // real per-partition binary batch shape. The oracle replays the
      // deterministic stub arithmetic (fit into 256×256, output bytes
      // proportional to the target area).
      (s, d) => {
        val media = graft.multimodal.MultimodalOps.asMedia(
          docs(s, d), "doc_id", "text")
        graft.multimodal.MultimodalOps.resize(s, media, 256, 256)
          .select(col("media_id"), col("width"), col("height"),
            length(col("payload")).cast("long").as("out_bytes"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |  64 + (ascii(substring(text, 1, 1)) % 16) * 64 AS w,
             |  64 + (ascii(substring(text, 2, 1)) % 9) * 64 AS h,
             |  octet_length(encode(text)) AS len FROM documents),
             |s AS (SELECT media_id, len,
             |  GREATEST(1, CAST(TRUNC(w * LEAST(256.0 / w, 256.0 / h)) AS INT)) AS width,
             |  GREATEST(1, CAST(TRUNC(h * LEAST(256.0 / w, 256.0 / h)) AS INT)) AS height
             |  FROM m)
             |SELECT media_id, width, height,
             |  CAST(LEAST(len, GREATEST(1, (width * height) // 64)) AS BIGINT) AS out_bytes
             |FROM s ORDER BY media_id""".stripMargin)),

    Q("text_tfidf_topk", // TF-IDF keyword extraction per document —
      // the standard training-data-pipeline relevance signal (sklearn
      // smooth-idf formula: idf = ln((1+N)/(1+df)) + 1). Scale shape:
      // tf = one (doc,term) groupBy of the exploded tokens (map-side
      // combined); df = one groupBy of the ALREADY-AGGREGATED tf table
      // (so hot stopword terms cost counts, not row fan-out); the
      // tf ⋈ df equi-join carries only aggregates. The idf is rounded
      // to 12 decimals before the tf multiply so the ln() ulp never
      // reaches the ranking.
      (s, d) => {
        val docsT = docs(s, d)
        val n = docsT.agg(count(lit(1)).as("n"))
        val tf = docsT
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term").asc)
        tf.join(dfreq, "term").crossJoin(broadcast(n))
          .withColumn("tfidf", round(col("tf").cast("double") *
            round(log((lit(1.0) + col("n")) / (lit(1.0) + col("df"))) +
              1.0, 12), 6))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("term"), col("tf"), col("tfidf"))
          .orderBy(col("doc_id"), col("term"))
      },
      Some("""WITH n AS (SELECT COUNT(*) AS n FROM documents),
             |toks AS (SELECT doc_id,
             |  unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf
             |  FROM toks GROUP BY doc_id, term),
             |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
             |scored AS (
             |  SELECT tf.doc_id, tf.term, tf.tf,
             |    ROUND(CAST(tf.tf AS DOUBLE) *
             |      ROUND(LN((1.0 + n.n) / (1.0 + dfreq.df)) + 1.0, 12),
             |      6) AS tfidf
             |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
             |SELECT doc_id, term, tf, tfidf FROM (
             |  SELECT doc_id, term, tf, tfidf,
             |    ROW_NUMBER() OVER (PARTITION BY doc_id
             |      ORDER BY tfidf DESC, term ASC) AS rn
             |  FROM scored)
             |WHERE rn <= 3 ORDER BY doc_id, term""".stripMargin)),

    Q("bpe_merge_candidates", // tokenizer training, first BPE round:
      // character-pair frequencies over the corpus word multiset
      // (pair count = Σ_words n(word) · occurrences-in-word), top-20
      // merge candidates by (count desc, pair asc). Scale shape: one
      // word-count shuffle (map-side combined), pair explosion over the
      // DISTINCT-word table only (≪ corpus), one pair shuffle, top-k.
      (s, d) => docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .filter(length(col("w")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).as("n_occ"))
        .orderBy(col("n_occ").desc, col("pair").asc)
        .limit(20),
      Some("""WITH words AS (
             |  SELECT w, COUNT(*) AS n FROM (
             |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
             |  GROUP BY w),
             |prs AS (
             |  SELECT n, unnest(list_transform(range(1, length(w)),
             |    i -> substring(w, i, 2))) AS pair
             |  FROM words WHERE length(w) >= 2)
             |SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occ
             |FROM prs GROUP BY pair
             |ORDER BY n_occ DESC, pair ASC LIMIT 20""".stripMargin)),

    Q("bpe_train_rounds", // multi-round BPE tokenizer TRAINING (r13
      // verdict ask #2): the driver loop of merge → re-tokenize →
      // recount that bpe_merge_candidates is one round of. 4 rounds
      // here; the oracle replays them as unrolled CTEs with the same
      // wrapped-symbol string representation, where a greedy
      // left-to-right merge is a literal replace() in both engines
      // (graft.text.BpeOps for the device). Scale shape: corpus touched
      // once (word counts); each round is one pair aggregation over the
      // distinct-word table + a one-row collect.
      (s, d) => BpeOps.trainBpe(docs(s, d), "text", 4)
        .orderBy(col("round")),
      Some {
        val emit = (1 to 4).map(r =>
          s"""SELECT CAST($r AS INT) AS round,
             |  string_split(pair, chr(31))[1] AS pair_a,
             |  string_split(pair, chr(31))[2] AS pair_b,
             |  replace(pair, chr(31), '') AS merged, n_occ FROM t$r"""
            .stripMargin).mkString("\nUNION ALL\n")
        s"""WITH ${bpeSqlCtes(4, mergeThrough = 3)}
           |$emit
           |ORDER BY round""".stripMargin
      }),

    Q("bpe_encode_tokens", // tokenizer APPLICATION, fused with training
      // (train → encode → count, the full tokenizer lifecycle): corpus
      // token frequencies after 4 learned merges. The distinct-word
      // symbol table after the last merge round IS the greedy encoding
      // of every word, so application costs zero corpus passes beyond
      // the word-count scan; top-50 by (count desc, token asc).
      (s, d) => BpeOps.encodeBpe(docs(s, d), "text", 4)
        .orderBy(col("n_occ").desc, col("token"))
        .limit(50),
      Some(s"""WITH ${bpeSqlCtes(4, mergeThrough = 4)}
              |SELECT token, CAST(SUM(n) AS BIGINT) AS n_occ FROM (
              |  SELECT n, unnest(string_split(trim(syms, chr(31)),
              |    chr(31) || chr(31))) AS token FROM s4)
              |WHERE token <> ''
              |GROUP BY token
              |ORDER BY n_occ DESC, token ASC LIMIT 50""".stripMargin)),

    Q("bpe_tokenize_heldout", // tokenizer DEPLOYMENT: train the merge
      // table on the even-doc_id split, tokenize the odd-doc_id split
      // the trainer never saw — a shipped tokenizer IS its merge table,
      // and encoding new text replays the greedy wrapped-symbol replace
      // chain in merge order (BpeOps.applyBpe: batched replaces over the
      // held-out distinct-word table, lineage checkpoint per batch).
      // Oracle: training CTEs over the even split (t1..t4 winners), then
      // h0..h4 replay each merge as the identical replace() over the odd
      // split's word table. Top-50 by (count desc, token asc).
      (s, d) => {
        val dd = docs(s, d)
        BpeOps.tokenizeWith(
            dd.filter(col("doc_id") % 2 === 0),
            dd.filter(col("doc_id") % 2 === 1), "text", 4)
          .orderBy(col("n_occ").desc, col("token"))
          .limit(50)
      },
      Some {
        // LEFT JOIN + CASE — same exhaustion tolerance as s_r: a round
        // the trainer never learned must leave the held-out table as-is
        val applyRounds = (1 to 4).map { r =>
          s"""h$r AS MATERIALIZED (
             |  SELECT h.n, CASE WHEN t.pair IS NULL THEN h.syms
             |    ELSE replace(h.syms,
             |      chr(31) || string_split(t.pair, chr(31))[1] || chr(31) ||
             |        chr(31) || string_split(t.pair, chr(31))[2] || chr(31),
             |      chr(31) || replace(t.pair, chr(31), '') || chr(31))
             |    END AS syms
             |  FROM h${r - 1} h LEFT JOIN t$r t ON TRUE)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${bpeSqlCtes(4, mergeThrough = 3,
                where = " WHERE doc_id % 2 = 0")},
           |h0 AS MATERIALIZED (
           |  SELECT n, regexp_replace(w, '(.)',
           |    chr(31) || '\\1' || chr(31), 'g') AS syms FROM (
           |    SELECT w, COUNT(*) AS n FROM (
           |      SELECT unnest(string_split(text, ' ')) AS w
           |      FROM documents WHERE doc_id % 2 = 1)
           |    GROUP BY w)),
           |$applyRounds
           |SELECT token, CAST(SUM(n) AS BIGINT) AS n_occ FROM (
           |  SELECT n, unnest(string_split(trim(syms, chr(31)),
           |    chr(31) || chr(31))) AS token FROM h4)
           |WHERE token <> ''
           |GROUP BY token
           |ORDER BY n_occ DESC, token ASC LIMIT 50""".stripMargin
      }),

    Q("doc_chunk_overlap", // fixed token-window chunking with stride
      // (window=32, stride=24 → 8-token overlap) — the RAG/pretraining
      // document splitter. Chunk starts are 1 + k·stride for
      // k = 0 .. max(0, ⌈(n − w)/stride⌉), so generation stops at the
      // first chunk that reaches the document end (no redundant suffix
      // chunks). Pure per-row explode + slice — a projection, zero
      // shuffle at any scale.
      (s, d) => {
        val w = 32; val st = 24
        docs(s, d)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
          .withColumn("n", size(col("ts")))
          .withColumn("k", explode(sequence(lit(0L),
            greatest(lit(0L),
              ceil((col("n") - lit(w)).cast("double") / st)))))
          .select(col("doc_id"), col("k").as("chunk_id"),
            array_join(slice(col("ts"), (col("k") * st + 1).cast("int"),
              lit(w)), " ").as("chunk_text"))
          .withColumn("n_chunk_tokens",
            size(split(col("chunk_text"), " ")))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some("""SELECT doc_id, k AS chunk_id,
             |  array_to_string(ts[(k*24+1):least(k*24+32, n)], ' ')
             |    AS chunk_text,
             |  CAST(least(k*24+32, n) - k*24 AS INT) AS n_chunk_tokens
             |FROM (
             |  SELECT doc_id, ts, n,
             |    unnest(range(0, GREATEST(0,
             |      CAST(CEIL((n - 32) / 24.0) AS BIGINT)) + 1)) AS k
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ts,
             |          len(string_split(text, ' ')) AS n FROM documents))
             |ORDER BY doc_id, chunk_id""".stripMargin)),

    Q("pack_sequences", // concat-and-chunk sequence packing plan: the
      // token stream of all documents in doc_id order fills fixed
      // 256-token training bins; each doc gets its bin id and intra-bin
      // offset from an EXCLUSIVE prefix sum of token counts. The prefix
      // sum is RankOps.exclusiveCumsum — the two-pass range-partitioned
      // device, NOT a single-partition global window — so the packing
      // plan for a 100 TB corpus shuffles each row once.
      (s, d) => {
        val toks = docs(s, d).select(col("doc_id"),
          TextOps.nTokens(col("text")).cast("long").as("n_tokens"))
        graft.functions.RankOps
          .exclusiveCumsum(toks, "doc_id", "n_tokens", "cum_before")
          .select(col("doc_id"), col("n_tokens"),
            floor(col("cum_before") / 256.0).cast("long").as("bin_id"),
            (col("cum_before") - floor(col("cum_before") / 256.0)
              .cast("long") * 256).as("bin_offset"))
          .withColumn("spans_bins",
            (col("bin_offset") + col("n_tokens") > 256).cast("int"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, n_tokens,
             |  CAST(FLOOR(cum_before / 256.0) AS BIGINT) AS bin_id,
             |  cum_before - CAST(FLOOR(cum_before / 256.0) AS BIGINT) * 256
             |    AS bin_offset,
             |  CAST(CASE WHEN cum_before
             |      - CAST(FLOOR(cum_before / 256.0) AS BIGINT) * 256
             |      + n_tokens > 256 THEN 1 ELSE 0 END AS INT) AS spans_bins
             |FROM (
             |  SELECT doc_id, n_tokens,
             |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cum_before
             |  FROM (SELECT doc_id,
             |          CAST(len(string_split(text, ' ')) AS BIGINT)
             |            AS n_tokens FROM documents))
             |ORDER BY doc_id""".stripMargin)),

    Q("text_bigram_lm_score", // corpus-trained add-1 bigram LM as a
      // perplexity-proxy quality score (the KenLM-filter shape): corpus
      // bigram/unigram counts + vocabulary size feed
      // avg ln((C2(w1,w2)+1)/(C1(w1)+V)) per document. Scale shape: two
      // count shuffles (map-side combined) to train, one broadcastable
      // count-table join to score — the LM "model" is the count tables,
      // never driver state. Log terms go through the round-12 detSum
      // grid (the engine-portable float device).
      (s, d) => {
        val base = docs(s, d)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("__ts"))
          .localCheckpoint(eager = false)
        val uni = base.select(explode(col("__ts")).as("w1"))
          .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        val vocab = uni.agg(count(lit(1)).as("v"))
        val bi = base.select(col("doc_id"),
            explode(TextOps.shinglesFromTokens(col("__ts"), 2)).as("bg"))
        val c2 = bi.groupBy(col("bg").as("bg2")).agg(count(lit(1)).as("c2"))
        bi.join(c2, col("bg") === col("bg2"))
          .withColumn("w1", substring_index(col("bg"), " ", 1))
          .join(uni, "w1")
          .crossJoin(broadcast(vocab))
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_bigrams"),
            round(detSum(log((col("c2") + 1).cast("double") /
                (col("c1") + col("v")))) / count(lit(1)), 6)
              .as("avg_logprob"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS MATERIALIZED (
             |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
             |uni AS MATERIALIZED (
             |  SELECT w1, COUNT(*) AS c1 FROM (
             |    SELECT unnest(ts) AS w1 FROM toks) GROUP BY w1),
             |vocab AS (SELECT COUNT(*) AS v FROM uni),
             |bi AS MATERIALIZED (
             |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
             |    i -> ts[i] || ' ' || ts[i+1])) AS bg FROM toks),
             |c2 AS MATERIALIZED (
             |  SELECT bg AS bg2, COUNT(*) AS c2 FROM bi GROUP BY bg)
             |SELECT doc_id, COUNT(*) AS n_bigrams,
             |  ROUND(${sqlDetSum(
                  "LN(CAST(c.c2 + 1 AS DOUBLE) / (u.c1 + vocab.v))")}
             |    / COUNT(*), 6) AS avg_logprob
             |FROM bi
             |JOIN c2 c ON c.bg2 = bi.bg
             |JOIN uni u ON u.w1 = string_split(bi.bg, ' ')[1]
             |CROSS JOIN vocab
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )
}
