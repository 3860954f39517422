package graft.queries

import graft.Graft
import graft.llm.{Bpe, Decontaminate, Dedup, LangModel, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline queries over `documents` / `embeddings`, each
  * paired with a DuckDB oracle computing the *identical* algorithm.
  *
  * Determinism conventions (beyond EventQueries'):
  *   - all hashing goes through the shared 60-bit md5-derived hash
  *     ([[TextOps.h60]] ≡ `('0x' || substr(md5(s),1,15))::BIGINT`);
  *   - all float reductions are left-fold in array order with exact
  *     float→double widening, so doubles match bit-for-bit;
  *   - thresholds only ever compare integer-derived quantities (signature
  *     agreement counts, Hamming distances, Jaccard from counts) — never a
  *     float against a data-dependent boundary.
  */
object LlmQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Graft.table(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame = Graft.table(s, dir, "embeddings")

  /** Shared oracle fragments. */
  private val h60sql = (e: String) => s"('0x' || substr(md5($e),1,15))::BIGINT"
  private val tokSql =
    """tok AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '') AS toks
       FROM documents)"""
  // distinct word-3-shingles; a doc shorter than 3 tokens contributes its
  // whole token string (mirrors TextOps.shingles)
  private val shSql =
    s"""sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
        THEN list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
        ELSE [array_to_string(toks, ' ')] END) AS s FROM tok)"""

  // ------------------------------------------------------------ exact dedup

  def dedupExactQ(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(s, dir), "doc_id", "text").orderBy("doc_id")
  val dedupExactSql: String =
    """SELECT doc_id, md5(text) AS content_hash,
       min(doc_id) OVER (PARTITION BY md5(text)) AS dup_of,
       doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
       FROM documents ORDER BY doc_id""".replaceAll("\\s+", " ")

  // ---------------------------------------------------------- minhash + LSH

  def dedupMinhashQ(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(docs(s, dir), "doc_id", "text").orderBy("id_a", "id_b")
  val dedupMinhashSql: String = {
    // the identical mixing families, from the same JVM-derived constants
    val sigList = graft.llm.TextOps.minhashConsts(16).map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ((h >> 30) * $a + (h & 1073741823) * $b) % ${graft.llm.TextOps.mixPrime}))"
    }.mkString("[", ", ", "]")
    s"""WITH $tokSql, $shSql,
       hsc AS (SELECT doc_id, list_transform(s, x -> ${h60sql("x")}) AS hs FROM sh),
       sig AS (SELECT doc_id, $sigList AS sig FROM hsc),
       band AS (SELECT doc_id, sig, b,
                 md5(b::VARCHAR || '|' || array_to_string(sig[b*4+1:b*4+4], ',')) AS bh
                FROM sig, (SELECT unnest(range(4)) AS b)),
       p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               round(CAST(len(list_filter(range(16), i -> a.sig[i+1] = b.sig[i+1])) AS DOUBLE) / 16, 6) AS est_jaccard
             FROM band a JOIN band b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id)
       SELECT id_a, id_b, est_jaccard FROM p WHERE est_jaccard >= 0.5 ORDER BY 1, 2"""
      .replaceAll("\\s+", " ")
  }

  // ------------------------------------------------------- dedup clusters

  /** q_dedup_clusters: duplicate-cluster assignment — connected components
    * over the MinHash near-dup pair graph (Dedup.connectedComponents);
    * every doc in a pair gets cluster_id = min doc_id of its component.
    * The oracle recomputes the same pair set (the q_dedup_minhash CTE) and
    * closes it transitively with a recursive CTE. */
  def dedupClustersQ(s: SparkSession, dir: String): DataFrame = {
    // single-consumer pair stream (r22): connectedComponents' probe is the
    // only action reading the pairs, so skip minhashLsh's decoupling
    // checkpoint and release the signature persist once the labels exist
    // (identical pair set ⟹ identical clusters; the oracle re-derives both)
    val (pairs, banded) = Dedup.minhashLshParts(docs(s, dir), "doc_id", "text")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
    banded.unpersist(false)
    out.orderBy("doc_id")
  }
  val dedupClustersSql: String = {
    val pairs = dedupMinhashSql
      .replaceAll("ORDER BY 1, 2", "")
      .replaceAll("^WITH ", "")
      .replaceAll("SELECT id_a, id_b, est_jaccard FROM p WHERE est_jaccard >= 0.5",
        ", pe AS (SELECT id_a, id_b FROM p WHERE est_jaccard >= 0.5)")
    s"""WITH RECURSIVE $pairs,
       e AS (SELECT id_a AS a, id_b AS b FROM pe
             UNION ALL SELECT id_b, id_a FROM pe),
       reach(a, b) AS (SELECT a, b FROM e
                       UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
       SELECT a AS doc_id, least(a, min(b)) AS cluster_id
       FROM reach GROUP BY a ORDER BY 1""".replaceAll("\\s+", " ")
  }

  // --------------------------------------------------------- keep-best

  /** q_dedup_keepbest: canonical-document selection — per duplicate
    * cluster keep the longest member (ties → smallest doc_id), drop the
    * rest. Composes the MinHash pair graph, connected components, and the
    * per-cluster argmax. */
  def dedupKeepbestQ(s: SparkSession, dir: String): DataFrame = {
    // same single-consumer fusion as q_dedup_clusters (r22)
    val (pairs, banded) = Dedup.minhashLshParts(docs(s, dir), "doc_id", "text")
    val out = Dedup.keepBest(docs(s, dir), pairs)
    banded.unpersist(false)
    out.orderBy("doc_id")
  }
  val dedupKeepbestSql: String =
    dedupClustersSql.replace(
      "SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a ORDER BY 1",
      ", cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a) " +
        "SELECT doc_id, cluster_id, " +
        "row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) = 1 AS keep " +
        "FROM cl JOIN documents USING (doc_id) ORDER BY doc_id")

  // --------------------------------------------------------------- simhash

  def dedupSimhashQ(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(s, dir), "doc_id", "text").orderBy("id_a", "id_b")
  val dedupSimhashSql: String = {
    val bitSum = (0 until 60).map { b =>
      s"(CASE WHEN list_sum(list_transform(ths, h -> ((h >> $b) & 1)*2 - 1)) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH $tokSql,
       sim AS (SELECT doc_id, $bitSum AS sh
               FROM (SELECT doc_id, list_transform(toks, t -> ${h60sql("t")}) AS ths FROM tok)),
       blk AS (SELECT doc_id, sh, c, (sh >> (c*15)) % 32768 AS chunk
               FROM sim, (SELECT unnest(range(4)) AS c)),
       p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
             FROM blk a JOIN blk b ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
       SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY 1, 2"""
      .replaceAll("\\s+", " ")
  }

  // --------------------------------------------------------- n-gram Jaccard

  def dedupNgramQ(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(s, dir), "doc_id", "text").orderBy("id_a", "id_b")
  val dedupNgramSql: String =
    s"""WITH $tokSql, $shSql,
       inv AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS nsh, unnest(s) AS shingle FROM sh),
       p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.nsh AS n_a, b.nsh AS n_b,
               count(*) AS common
             FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2, 3, 4)
       SELECT id_a, id_b, common, n_a, n_b,
              round(CAST(common AS DOUBLE) / (n_a + n_b - common), 6) AS jaccard
       FROM p WHERE round(CAST(common AS DOUBLE) / (n_a + n_b - common), 6) >= 0.5 ORDER BY 1, 2"""
      .replaceAll("\\s+", " ")

  // ------------------------------------------------------ decontamination

  /** Benchmark decontamination: docs sharing ≥3 distinct word-3-grams with
    * the held-out "benchmark" slice (doc_id % 97 == 0). (Real pipelines use
    * 8-13-grams; the synthetic corpus's ~30-word vocabulary needs short
    * grams for a non-empty result at every SF.) */
  def decontaminateQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Decontaminate.contamination(
        d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3, minOverlap = 3L)
      .orderBy("doc_id", "bench_id")
  }
  val decontaminateSql: String =
    // range(1, len-1) is end-exclusive → i ∈ [1, len-2], the 3-gram starts;
    // grams join as the repo-wide h60 hash, mirroring the Spark side's
    // fused ShingleHashes long keys bit-for-bit
    s"""WITH $tokSql,
       pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM tok),
       g AS (SELECT DISTINCT doc_id, ${h60sql("array_to_string(toks[i:i+2], ' ')")} AS gram FROM pos)
       SELECT d.doc_id, b.doc_id AS bench_id, CAST(count(*) AS BIGINT) AS overlap
       FROM (SELECT * FROM g WHERE doc_id % 97 <> 0) d
       JOIN (SELECT * FROM g WHERE doc_id % 97 = 0) b USING (gram)
       GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY 1, 2"""
      .replaceAll("\\s+", " ")

  /** q_decontaminate_spans: span-level decontamination
    * (Decontaminate.decontaminateSpans) — contaminated docs (same %97
    * bench split and ≥3-of-3-grams threshold as q_decontaminate) lose the
    * tokens covered by any bench-shared 3-gram widened by margin 1; clean
    * runs of ≥3 tokens survive as numbered fragments; clean docs pass
    * through whole. The oracle restates the whole surgery — positional
    * gram hashes, coverage mask, gaps-and-islands runs — in DuckDB. */
  def decontaminateSpansQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.llm.Decontaminate.decontaminateSpans(
        d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3, margin = 1, minKeepTokens = 3, minOverlap = 3L)
      .orderBy("doc_id", "frag_idx")
  }
  val decontaminateSpansSql: String =
    // coverage window [p - margin, p + n - 1 + margin] = [p-1, p+3];
    // islands via the t - row_number() gaps trick, same run numbering as
    // the Spark fold (document order)
    s"""WITH $tokSql,
       pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM tok),
       pg AS (SELECT doc_id, i, ${h60sql("array_to_string(toks[i:i+2], ' ')")} AS gram FROM pos),
       g AS (SELECT DISTINCT doc_id, gram FROM pg),
       cont AS (SELECT DISTINCT d.doc_id
                FROM (SELECT * FROM g WHERE doc_id % 97 <> 0) d
                JOIN (SELECT * FROM g WHERE doc_id % 97 = 0) b USING (gram)
                GROUP BY d.doc_id, b.doc_id HAVING count(*) >= 3),
       bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
       bad AS (SELECT DISTINCT p.doc_id, p.i AS p
               FROM pg p JOIN cont USING (doc_id) JOIN bg USING (gram)),
       tkn AS (SELECT t.doc_id, unnest(range(1, len(t.toks) + 1)) AS t
               FROM tok t JOIN (SELECT DISTINCT doc_id FROM bad) USING (doc_id)),
       cl AS (SELECT k.doc_id, k.t FROM tkn k
              WHERE NOT EXISTS (SELECT 1 FROM bad c
                WHERE c.doc_id = k.doc_id AND k.t BETWEEN c.p - 1 AND c.p + 3)),
       isl AS (SELECT doc_id, t,
                      t - row_number() OVER (PARTITION BY doc_id ORDER BY t) AS grp
               FROM cl),
       fr AS (SELECT doc_id, min(t) AS s, count(*) AS l
              FROM isl GROUP BY doc_id, grp HAVING count(*) >= 3),
       frag AS (SELECT f.doc_id,
                       CAST(row_number() OVER (PARTITION BY f.doc_id ORDER BY f.s) - 1 AS BIGINT) AS frag_idx,
                       array_to_string(t.toks[f.s:f.s + f.l - 1], ' ') AS frag_text,
                       CAST(f.l AS BIGINT) AS n_tok
                FROM fr f JOIN tok t USING (doc_id)),
       clean AS (SELECT doc_id, CAST(0 AS BIGINT) AS frag_idx,
                        array_to_string(toks, ' ') AS frag_text,
                        CAST(len(toks) AS BIGINT) AS n_tok
                 FROM tok WHERE doc_id % 97 <> 0
                   AND doc_id NOT IN (SELECT doc_id FROM cont)
                   AND len(toks) >= 3)
       SELECT * FROM frag UNION ALL SELECT * FROM clean
       ORDER BY doc_id, frag_idx""".replaceAll("\\s+", " ")

  /** q_dedup_spans: cross-document exact duplicate-span removal
    * (Dedup.dedupSpans, the Lee et al. substring-dedup shape) — an
    * 8-gram appearing in more than one document is cut everywhere except
    * the smallest doc_id holding it; surviving runs of ≥ 5 tokens become
    * fragments. The oracle restates the min≠max-per-gram rule and the
    * same islands fold. */
  def dedupSpansQ(s: SparkSession, dir: String): DataFrame = {
    // The synthetic corpus's only natural cross-doc duplication is
    // whole-document copies — which this op handles but which never
    // exercises a PARTIAL cut. Every 25th document therefore re-enters
    // as a "quoting" doc: its full text plus a unique 8-token tail. The
    // quoted body is cut (the original keeps it), the tail survives as a
    // fragment — the span path runs end-to-end inside the oracle gate.
    val d = docs(s, dir).select("doc_id", "text")
    val quoting = d.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" qq ww ee rr tt yy uu x"),
          col("doc_id").cast("string")).as("text"))
    graft.llm.Dedup.dedupSpans(d.unionByName(quoting), "doc_id", "text",
        n = 8, minKeepTokens = 5)
      .orderBy("doc_id", "frag_idx")
  }
  val dedupSpansSql: String =
    s"""WITH base AS (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text || ' qq ww ee rr tt yy uu x' || CAST(doc_id AS VARCHAR)
              FROM documents WHERE doc_id % 25 = 0),
       tok AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '') AS toks
               FROM base),
       pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i FROM tok),
       pg AS (SELECT doc_id, i, ${h60sql("array_to_string(toks[i:i+7], ' ')")} AS gram FROM pos),
       dup AS (SELECT gram, min(doc_id) AS keep FROM pg
               GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
       bad AS (SELECT DISTINCT p.doc_id, p.i AS p
               FROM pg p JOIN dup d ON p.gram = d.gram AND p.doc_id <> d.keep),
       tkn AS (SELECT t.doc_id, unnest(range(1, len(t.toks) + 1)) AS t
               FROM tok t JOIN (SELECT DISTINCT doc_id FROM bad) USING (doc_id)),
       cl AS (SELECT k.doc_id, k.t FROM tkn k
              WHERE NOT EXISTS (SELECT 1 FROM bad c
                WHERE c.doc_id = k.doc_id AND k.t BETWEEN c.p AND c.p + 7)),
       isl AS (SELECT doc_id, t,
                      t - row_number() OVER (PARTITION BY doc_id ORDER BY t) AS grp
               FROM cl),
       fr AS (SELECT doc_id, min(t) AS s, count(*) AS l
              FROM isl GROUP BY doc_id, grp HAVING count(*) >= 5),
       frag AS (SELECT f.doc_id,
                       CAST(row_number() OVER (PARTITION BY f.doc_id ORDER BY f.s) - 1 AS BIGINT) AS frag_idx,
                       array_to_string(t.toks[f.s:f.s + f.l - 1], ' ') AS frag_text,
                       CAST(f.l AS BIGINT) AS n_tok
                FROM fr f JOIN tok t USING (doc_id)),
       clean AS (SELECT doc_id, CAST(0 AS BIGINT) AS frag_idx,
                        array_to_string(toks, ' ') AS frag_text,
                        CAST(len(toks) AS BIGINT) AS n_tok
                 FROM tok WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM bad)
                   AND len(toks) >= 5)
       SELECT * FROM frag UNION ALL SELECT * FROM clean
       ORDER BY doc_id, frag_idx""".replaceAll("\\s+", " ")

  /** q_dedup_paragraphs: cross-document exact paragraph removal
    * (Dedup.dedupParagraphs, the RefinedWeb/Dolma line-level dedup) —
    * shared blocks are planted deterministically (a per-mod-7-class
    * boilerplate line on every 3rd doc, a license line on every 5th);
    * each survives only in the smallest doc_id carrying it. Output keys
    * the reassembled text by md5 to keep the dump narrow. */
  def dedupParagraphsQ(s: SparkSession, dir: String): DataFrame = {
    val enriched = docs(s, dir).select(col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("\nshared boilerplate block "),
            pmod(col("doc_id"), lit(7)).cast("string"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0,
          lit("\nlicense text common to all documents")).otherwise(lit("")))
        .as("text"))
    graft.llm.Dedup.dedupParagraphs(enriched, "doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("text_md5"),
        col("n_paras"), col("n_removed"))
      .orderBy("doc_id")
  }
  val dedupParagraphsSql: String =
    """WITH m AS (SELECT doc_id, text
         || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'shared boilerplate block ' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'license text common to all documents' ELSE '' END AS mtext
       FROM documents),
       ls AS (SELECT doc_id, string_split(mtext, chr(10)) AS lines FROM m),
       px AS (SELECT doc_id, lines, unnest(range(1, len(lines) + 1)) AS p_idx FROM ls),
       p AS (SELECT doc_id, p_idx, lines[p_idx] AS para FROM px),
       d AS (SELECT md5(trim(para)) AS ph, min(doc_id) AS keep_doc
             FROM p WHERE trim(para) <> '' GROUP BY 1
             HAVING min(doc_id) <> max(doc_id)),
       j AS (SELECT p.doc_id, p.p_idx, p.para,
                    (d.ph IS NULL OR d.keep_doc = p.doc_id) AS keep
             FROM p LEFT JOIN d ON trim(p.para) <> '' AND md5(trim(p.para)) = d.ph)
       SELECT doc_id,
         md5(coalesce(string_agg(para, chr(10) ORDER BY p_idx) FILTER (WHERE keep), '')) AS text_md5,
         count(*) AS n_paras,
         CAST(coalesce(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_removed
       FROM j GROUP BY doc_id ORDER BY doc_id""".replaceAll("\\s+", " ")

  /** q_text_novelty: per-document cross-corpus duplication ratio
    * (Dedup.spanDupRatio) — the same quoting-doc planting as
    * q_dedup_spans so partial ratios appear (a quoting doc's grams are
    * mostly duplicated, its unique tail is not). */
  def textNoveltyQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    val quoting = d.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" qq ww ee rr tt yy uu x"),
          col("doc_id").cast("string")).as("text"))
    graft.llm.Dedup.spanDupRatio(d.unionByName(quoting), "doc_id", "text", n = 8)
      .orderBy("doc_id")
  }
  val textNoveltySql: String =
    s"""WITH base AS (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text || ' qq ww ee rr tt yy uu x' || CAST(doc_id AS VARCHAR)
              FROM documents WHERE doc_id % 25 = 0),
       tok AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '') AS toks
               FROM base),
       pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i FROM tok),
       pg AS (SELECT doc_id, i, ${h60sql("array_to_string(toks[i:i+7], ' ')")} AS gram FROM pos),
       dup AS (SELECT gram FROM pg GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
       tot AS (SELECT doc_id, count(*) AS n_grams FROM pg GROUP BY 1),
       dd AS (SELECT doc_id, count(*) AS n_dup FROM pg JOIN dup USING (gram) GROUP BY 1)
       SELECT t.doc_id, t.n_grams,
              CAST(coalesce(dd.n_dup, 0) AS BIGINT) AS n_dup_grams,
              round(CAST(coalesce(dd.n_dup, 0) AS DOUBLE) / t.n_grams, 6) AS dup_ratio
       FROM tot t LEFT JOIN dd USING (doc_id) ORDER BY doc_id""".replaceAll("\\s+", " ")

  /** q_corpus_stats: the per-shard audit report (Report.corpusStats) —
    * doc/token/char volumes, token-length spread, exact-duplicate rate
    * from the 60-bit text hash — one aggregation pass, restated 1:1. */
  def corpusStatsQ(s: SparkSession, dir: String): DataFrame =
    graft.llm.Report.corpusStats(docs(s, dir), "doc_id", "text", "source")
      .orderBy("shard")
  val corpusStatsSql: String =
    s"""WITH b AS (
       SELECT source AS shard,
              len(list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+'), t -> t <> ''))::BIGINT AS n_tok,
              length(coalesce(text, ''))::BIGINT AS n_chr,
              ${h60sql("coalesce(text, '')")} AS th
       FROM documents)
       SELECT shard, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
              sum(n_chr)::BIGINT AS n_chars,
              round(avg(n_tok), 4) AS avg_doc_tokens,
              min(n_tok) AS min_doc_tokens, max(n_tok) AS max_doc_tokens,
              count(DISTINCT th)::BIGINT AS n_distinct_texts,
              round((count(*) - count(DISTINCT th))::DOUBLE / count(*), 4) AS dup_rate
       FROM b GROUP BY shard ORDER BY shard""".replaceAll("\\s+", " ")

  /** q_mix_token_budget: token-budget mixture sampling
    * (Mix.tokenBudgetSample) — per-domain md5-ordered running token sums,
    * keep documents STARTING inside the budget; src2 runs unlimited
    * (budget -1), src3 takes the default. The oracle restates the window
    * cumsum + budget cut 1:1. */
  def mixTokenBudgetQ(s: SparkSession, dir: String): DataFrame =
    graft.llm.Mix.tokenBudgetSample(docs(s, dir), "doc_id", "text", "source",
      budgets = Map("src0" -> 20000L, "src1" -> 5000L, "src2" -> -1L),
      defaultBudget = 2000L)
      .select("doc_id", "source", "n_tok", "tok_start")
      .orderBy("doc_id")
  val mixTokenBudgetSql: String =
    """WITH b AS (
       SELECT doc_id, source,
              len(list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'), t -> t <> ''))::BIGINT AS n_tok
       FROM documents),
       c AS (
       SELECT doc_id, source, n_tok,
              coalesce(sum(n_tok) OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - n_tok, 0)::BIGINT AS tok_start
       FROM b)
       SELECT doc_id, source, n_tok, tok_start FROM c
       WHERE CASE source WHEN 'src0' THEN tok_start < 20000
                         WHEN 'src1' THEN tok_start < 5000
                         WHEN 'src2' THEN true
                         ELSE tok_start < 2000 END
       ORDER BY doc_id""".replaceAll("\\s+", " ")

  /** q_mix_importance: DSIR-style data selection (Mix.importanceResample)
    * — src0 is the TARGET domain; every other document scores by the
    * add-1-smoothed log-ratio of its hashed unigram+bigram buckets under
    * target vs raw, and a deterministic md5-Gumbel top-k draws the
    * selection. The oracle restates the whole construction 1:1: same
    * md5 bucketing, same rounded log-ratio literals, same Gumbel. */
  def mixImportanceQ(s: SparkSession, dir: String): DataFrame =
    graft.llm.Mix.importanceResample(docs(s, dir), "doc_id", "text",
      col("source") === "src0", k = 40, buckets = 1024)
      .orderBy("rk")
  val mixImportanceSql: String =
    """WITH t AS (
       SELECT doc_id, (source = 'src0') AS tgt,
              list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'), x -> x <> '') AS toks
       FROM documents),
       gr AS (
       SELECT doc_id, tgt,
              toks || list_transform(range(greatest(len(toks) - 1, 0)), i -> toks[i+1] || ' ' || toks[i+2]) AS grams
       FROM t),
       g1 AS (SELECT doc_id, tgt, unnest(grams) AS g FROM gr),
       g2 AS (SELECT doc_id, tgt, ('0x' || substr(md5(g), 1, 8))::BIGINT % 1024 AS b FROM g1),
       bc AS (SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END)::BIGINT AS cp,
                     sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END)::BIGINT AS cq
              FROM g2 GROUP BY b),
       tot AS (SELECT sum(cp)::DOUBLE AS tp, sum(cq)::DOUBLE AS tq FROM bc),
       lam AS (SELECT b, CAST(round((ln((cp + 1.0) / (tp + 1024.0)) - ln((cq + 1.0) / (tq + 1024.0))) * 1000000.0, 0) AS BIGINT) AS l
               FROM bc, tot),
       sc AS (SELECT g2.doc_id, sum(lam.l)::DOUBLE / 1000000.0 AS logw
              FROM g2 JOIN lam USING (b) WHERE NOT g2.tgt GROUP BY g2.doc_id),
       allraw AS (SELECT doc_id, coalesce(sc.logw, 0.0) AS logw
                  FROM (SELECT doc_id FROM t WHERE NOT tgt) r LEFT JOIN sc USING (doc_id)),
       key AS (SELECT doc_id, logw,
                logw - ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000 + 0.5) / 1000000.0)) AS k
               FROM allraw)
       SELECT CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS BIGINT) AS rk,
              doc_id, round(logw, 4) AS logw, round(k, 4) AS score
       FROM key QUALIFY rk <= 40 ORDER BY rk""".replaceAll("\\s+", " ")

  // ---------------------------------------------------- embedding near-dup

  /** DuckDB fragments for left-fold dot/norm matching Similarity exactly. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(64), j -> $a[j+1]::DOUBLE * $b[j+1]::DOUBLE), (x, y) -> x + y)"
  private val normCte =
    s"""n AS (SELECT vec_id, embedding,
       sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings)"""

  /** Near-duplicate report via banded sign-LSH candidates + exact cosine
    * re-rank (Similarity.nearDupPairsLsh) — the scale path; the all-pairs
    * baseline is test-only (LlmSpec planted-duplicate recall). The oracle
    * restates the identical algorithm with the same JVM-derived hyperplane
    * literals. INVARIANT the static SQL depends on (r20): the operator's
    * scale-aware plane count and hot-bucket guard only engage above the
    * gate scales (effPlanes floor wins for N ≤ 2^6·64; maxBucket=4096 >
    * any gate bucket), so at sf0.001/sf0.01 the plan is byte-equivalent
    * to the plain 6-plane exhaustive algorithm restated here —
    * SimilaritySkewSpec's gate-safety case pins exactly this. */
  def dedupEmbeddingQ(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairsLsh(embs(s, dir), "vec_id", "embedding", 20).orderBy("rk")
  val dedupEmbeddingSql: String = {
    def bucketExpr(f: Int): String =
      Similarity.hyperplanesSeeded(f, 6, 64).zipWithIndex.map { case (p, h) =>
        val lit = p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]") + "::DOUBLE[]"
        s"(CASE WHEN list_reduce(list_transform(range(64), j -> embedding[j+1]::DOUBLE * ($lit)[j+1]), (x, y) -> x + y) >= 0 THEN ${1L << h} ELSE 0 END)"
      }.mkString(" + ")
    val bks = (0 until 4).map(f => s"(${bucketExpr(f)}) AS b$f").mkString(", ")
    val cands = (0 until 4).map(f =>
      s"SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM bk a JOIN bk b ON a.b$f = b.b$f AND a.vec_id < b.vec_id")
      .mkString(" UNION ")
    s"""WITH $normCte,
       bk AS (SELECT vec_id, $bks FROM n),
       c AS ($cands),
       sc AS (SELECT id_a, id_b,
               round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos
             FROM c JOIN n a ON a.vec_id = c.id_a JOIN n b ON b.vec_id = c.id_b)
       SELECT CAST(row_number() OVER (ORDER BY cos DESC, id_a, id_b) AS BIGINT) AS rk, id_a, id_b, cos
       FROM sc QUALIFY rk <= 20 ORDER BY rk""".replaceAll("\\s+", " ")
  }

  // ------------------------------------------------------------------- kNN

  def knnBruteQ(s: SparkSession, dir: String): DataFrame =
    Similarity.knnBrute(embs(s, dir), "vec_id", "embedding", col("vid") < 10, 5)
      .orderBy("query_id", "rk")
  val knnBruteSql: String =
    s"""WITH $normCte,
       q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn FROM n WHERE vec_id < 10),
       p AS (SELECT query_id, n.vec_id AS neighbor_id,
               round(${dotSql("qv", "n.embedding")} / (qn * n.nrm), 6) AS cos
             FROM n, q WHERE n.vec_id <> query_id)
       SELECT query_id,
              CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk,
              neighbor_id, cos
       FROM p QUALIFY rk <= 5 ORDER BY query_id, rk""".replaceAll("\\s+", " ")

  def knnLshQ(s: SparkSession, dir: String): DataFrame =
    Similarity.knnLsh(embs(s, dir), "vec_id", "embedding", col("vid") < 10, 3)
      .orderBy("query_id", "rk")
  val knnLshSql: String = {
    val planes = Similarity.hyperplanes(8, 64)
    val bucket = planes.zipWithIndex.map { case (p, h) =>
      val lit = p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]") + "::DOUBLE[]"
      s"(CASE WHEN list_reduce(list_transform(range(64), j -> embedding[j+1]::DOUBLE * ($lit)[j+1]), (x, y) -> x + y) >= 0 THEN ${1L << h} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH $normCte,
       bk AS (SELECT vec_id, embedding, nrm, $bucket AS bucket FROM n),
       q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn, bucket FROM bk WHERE vec_id < 10),
       p AS (SELECT query_id, bk.vec_id AS neighbor_id,
               round(${dotSql("qv", "bk.embedding")} / (qn * bk.nrm), 6) AS cos
             FROM bk JOIN q USING (bucket) WHERE bk.vec_id <> q.query_id)
       SELECT query_id,
              CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk,
              neighbor_id, cos
       FROM p QUALIFY rk <= 3 ORDER BY query_id, rk""".replaceAll("\\s+", " ")
  }

  /** q_knn_ivf: IVF-flat ANN — first-8-vector centroids, nprobe=2, exact
    * re-rank (Similarity.knnIvf). The oracle restates assignment, probing
    * and re-ranking with the identical rounded-cosine ordering. */
  def knnIvfQ(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val centroids = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    Similarity.knnIvf(e, "vec_id", "embedding", col("vid") < 10, 3, centroids, nprobe = 2)
      .orderBy("query_id", "rk")
  }
  val knnIvfSql: String =
    s"""WITH $normCte,
       c AS (SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm FROM n WHERE vec_id < 8),
       asg AS (SELECT n.vec_id AS vid, cid, n.embedding AS v, n.nrm AS nrm
               FROM n CROSS JOIN c
               QUALIFY row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY round(${dotSql("n.embedding", "cvec")} / (n.nrm * cnrm), 6) DESC, cid) = 1),
       pr AS (SELECT n.vec_id AS query_id, n.embedding AS qv, n.nrm AS qn, cid
              FROM n CROSS JOIN c WHERE n.vec_id < 10
              QUALIFY row_number() OVER (PARTITION BY n.vec_id
                ORDER BY round(${dotSql("n.embedding", "cvec")} / (n.nrm * cnrm), 6) DESC, cid) <= 2),
       p AS (SELECT query_id, a.vid AS neighbor_id,
               round(${dotSql("qv", "a.v")} / (qn * a.nrm), 6) AS cos
             FROM pr JOIN asg a USING (cid) WHERE a.vid <> pr.query_id)
       SELECT query_id,
              CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk,
              neighbor_id, cos
       FROM p QUALIFY rk <= 3 ORDER BY query_id, rk""".replaceAll("\\s+", " ")

  // --------------------------------------------------------------- IVF-PQ

  /** IVF-PQ + ADC with DETERMINISTIC codebooks (subvectors of the first-8
    * corpus vectors — a trained quantizer cannot be restated in SQL; the
    * trained path's quality gate is PqSpec): coarse lists as q_knn_ivf,
    * ADC approx top k·refine, exact re-rank to k. */
  def knnIvfPqQ(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val centroids = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cw = e.filter(col("vec_id") < 8).orderBy("vec_id")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val codebooks = (0 until 4).map(sb =>
      (0 until 8).map(c => cw(c).slice(sb * 16, (sb + 1) * 16).toSeq).toSeq).toSeq
    val pq = graft.llm.Pq.PqModel(4, 8, 16, codebooks)
    graft.llm.Pq.knnIvfPq(e, "vec_id", "embedding", col("vid") < 10, 3,
        centroids, pq, nprobe = 2, refine = 2)
      .orderBy("query_id", "rk")
  }
  val knnIvfPqSql: String = {
    // left-fold slices so doubles match the Spark folds bit-for-bit
    def dotSlice(a: String, aOff: String, b: String, bOff: String) =
      s"""list_reduce(list_transform(range(16),
          j -> $a[$aOff + j + 1]::DOUBLE * $b[$bOff + j + 1]::DOUBLE), (x, y) -> x + y)"""
    def d2Slice(a: String, aOff: String, b: String, bOff: String) =
      s"""list_reduce(list_transform(range(16),
          j -> ($a[$aOff + j + 1]::DOUBLE - $b[$bOff + j + 1]::DOUBLE)
             * ($a[$aOff + j + 1]::DOUBLE - $b[$bOff + j + 1]::DOUBLE)), (x, y) -> x + y)"""
    s"""WITH $normCte,
       c AS (SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm FROM n WHERE vec_id < 8),
       cb AS (SELECT vec_id AS code, embedding AS cw FROM n WHERE vec_id < 8),
       asg AS (SELECT n.vec_id AS vid, cid, n.embedding AS v, n.nrm AS nrm
               FROM n CROSS JOIN c
               QUALIFY row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY round(${dotSql("n.embedding", "cvec")} / (n.nrm * cnrm), 6) DESC, cid) = 1),
       enc AS (SELECT vid, cid, v, nrm, s, code, cw
               FROM asg CROSS JOIN (SELECT unnest(range(4)) AS s) CROSS JOIN cb
               QUALIFY row_number() OVER (PARTITION BY vid, s
                 ORDER BY ${d2Slice("v", "s*16", "cw", "s*16")}, code) = 1),
       pr AS (SELECT n.vec_id AS query_id, n.embedding AS qv, n.nrm AS qn, cid
              FROM n CROSS JOIN c WHERE n.vec_id < 10
              QUALIFY row_number() OVER (PARTITION BY n.vec_id
                ORDER BY round(${dotSql("n.embedding", "cvec")} / (n.nrm * cnrm), 6) DESC, cid) <= 2),
       terms AS (SELECT pr.query_id, pr.qv, pr.qn, e.vid, e.v AS vv, e.nrm AS vnrm, e.s,
                   ${dotSlice("pr.qv", "e.s*16", "e.cw", "e.s*16")} AS term
                 FROM pr JOIN enc e USING (cid) WHERE e.vid <> pr.query_id),
       adc AS (SELECT query_id, vid,
                 any_value(qv) AS qv, any_value(qn) AS qn,
                 any_value(vv) AS vv, any_value(vnrm) AS vnrm,
                 round(list_reduce(list(term ORDER BY s), (x, y) -> x + y), 6) AS approx
               FROM terms GROUP BY query_id, vid
               QUALIFY row_number() OVER (PARTITION BY query_id
                 ORDER BY approx DESC, vid) <= 6),
       p AS (SELECT query_id, vid AS neighbor_id,
               round(${dotSql("qv", "vv")} / (qn * vnrm), 6) AS cos
             FROM adc)
       SELECT query_id,
              CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rk,
              neighbor_id, cos
       FROM p QUALIFY rk <= 3 ORDER BY query_id, rk""".replaceAll("\\s+", " ")
  }

  // ----------------------------------------------------------- language ID

  def textLangidQ(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val (pred, score) = TextOps.langId(toks)
    docs(s, dir).select(col("doc_id"), col("lang"), pred.as("lang_pred"), score.as("score"))
      .orderBy("doc_id")
  }
  val textLangidSql: String = {
    val scores = TextOps.stopwords.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(toks, t -> t IN ($list))) AS BIGINT) AS s_$lang"
    }.mkString(", ")
    val langs = TextOps.stopwords.map(_._1)
    val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
    val chain = langs.map(l => s"WHEN s_$l = best THEN '$l'").mkString(" ")
    s"""WITH $tokSql,
       sc AS (SELECT doc_id, $scores FROM tok),
       b AS (SELECT *, $best AS best FROM sc)
       SELECT d.doc_id, d.lang,
              CASE WHEN best = 0 THEN 'und' $chain END AS lang_pred,
              best AS score
       FROM b JOIN documents d USING (doc_id) ORDER BY doc_id""".replaceAll("\\s+", " ")
  }

  // ------------------------------------------------------------- quality

  /** Gopher-style repetition signals per document. */
  def textRepetitionQ(s: SparkSession, dir: String): DataFrame = {
    val feats = TextOps.repetitionFeatures(col("text"))
    docs(s, dir).select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
  }
  val textRepetitionSql: String =
    s"""WITH $tokSql,
       g2 AS (SELECT doc_id, toks,
                CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' '))
                  ELSE [] END AS grams
              FROM tok)
       SELECT doc_id,
         round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1), 6) AS dup_word_ratio,
         round(CASE WHEN len(grams) = 0 THEN 0.0
               ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) END, 6) AS dup_2gram_ratio,
         round(CAST(list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / greatest(len(toks), 1), 6) AS top_tok_ratio
       FROM g2 ORDER BY doc_id""".replaceAll("\\s+", " ")

  def textQualityQ(s: SparkSession, dir: String): DataFrame = {
    val feats = TextOps.qualityFeatures(col("text"))
    docs(s, dir).select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
  }
  val textQualitySql: String = {
    val en = TextOps.stopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH $tokSql
       SELECT d.doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / greatest(len(toks), 1), 6) AS mean_tok_len,
         round(CAST(len(list_filter(toks, t -> t IN ($en))) AS DOUBLE) / greatest(len(toks), 1), 6) AS stop_ratio,
         round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1), 6) AS alpha_ratio,
         round(CAST(least(len(toks), 200) AS DOUBLE) / 200 * 0.3
             + CAST(len(list_filter(toks, t -> t IN ($en))) AS DOUBLE) / greatest(len(toks), 1) * 0.4
             + CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / greatest(length(text), 1) * 0.3, 6) AS quality
       FROM documents d JOIN tok USING (doc_id) ORDER BY doc_id""".replaceAll("\\s+", " ")
  }

  // ----------------------------------------------------- Gopher rules

  /** The synthetic corpus is uniform word salad, so the rule-triggering
    * shapes (bullets, ellipses, symbols, stopword runs) are planted
    * deterministically from doc_id — identically on both sides; the rule
    * evaluator, not the markers, is the operator (same methodology as
    * q_text_c4filters). */
  private def gopherEnriched = concat(col("text"),
    when(pmod(col("doc_id"), lit(3)) === 0,
      lit("\nthe cost of that update have to land with and be near")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(4)) === 0,
      lit("\n- bullet one\n- bullet two")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(5)) === 0,
      lit("\ntrailing thought...")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(7)) === 0, lit(" ## ##")).otherwise(lit("")))
  private val gopherEnrichedSql =
    """text
       || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'the cost of that update have to land with and be near' ELSE '' END
       || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '- bullet one' || chr(10) || '- bullet two' ELSE '' END
       || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'trailing thought...' ELSE '' END
       || CASE WHEN doc_id % 7 = 0 THEN ' ## ##' ELSE '' END"""

  /** q_text_gopher: the Gopher Table-A1 rule thresholds per document. */
  def textGopherQ(s: SparkSession, dir: String): DataFrame = {
    val feats = TextOps.gopherRules(gopherEnriched)
    docs(s, dir).select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
  }
  val textGopherSql: String = {
    val stops = TextOps.gopherStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH m AS (SELECT doc_id, $gopherEnrichedSql AS mtext FROM documents),
       t AS (SELECT doc_id, mtext,
               list_filter(regexp_split_to_array(lower(trim(mtext)), '\\s+'), t -> t <> '') AS toks,
               string_split(mtext, chr(10)) AS lines
             FROM m),
       f AS (SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                 / greatest(len(toks), 1) AS mean_len,
               (CAST(length(mtext) - length(regexp_replace(mtext, '#', '', 'g')) AS DOUBLE)
                 + CAST(length(mtext) - length(regexp_replace(mtext, '\\.\\.\\.', '', 'g')) AS DOUBLE) / 3)
                 / greatest(len(toks), 1) AS sym_ratio,
               CAST(len(list_filter(lines, x -> regexp_matches(x, '^\\s*[-*•]'))) AS DOUBLE)
                 / greatest(len(lines), 1) AS bullet_frac,
               CAST(len(list_filter(lines, x -> regexp_matches(x, '\\.\\.\\.\\s*$$'))) AS DOUBLE)
                 / greatest(len(lines), 1) AS ellipsis_frac,
               CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
                 / greatest(len(toks), 1) AS alpha_frac,
               CAST(len(list_distinct(list_filter(toks, t -> t IN ($stops)))) AS BIGINT) AS stop_hits
             FROM t)
       SELECT doc_id, n_words,
         round(mean_len, 6) AS mean_word_len,
         round(sym_ratio, 6) AS symbol_ratio,
         round(bullet_frac, 6) AS bullet_frac,
         round(ellipsis_frac, 6) AS ellipsis_frac,
         round(alpha_frac, 6) AS alpha_word_frac,
         stop_hits,
         (n_words BETWEEN 50 AND 100000 AND mean_len BETWEEN 3 AND 10
          AND sym_ratio <= 0.1 AND bullet_frac <= 0.9
          AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
          AND stop_hits >= 2) AS keep
       FROM f ORDER BY doc_id""".replaceAll("\\s+", " ")
  }

  // ------------------------------------------------- C4 filters and PII

  /** The synthetic corpus is punctuation-free word salad, so these two
    * queries plant deterministic markers (newline-separated sentences,
    * boilerplate, emails/IPs/phones) derived from doc_id — IDENTICALLY in
    * Spark and the oracle — and run the corpus-agnostic detectors over the
    * enriched text. The detectors, not the markers, are the operator. */
  private def c4Enriched = concat(col("text"),
    when(pmod(col("doc_id"), lit(2)) === 0, lit("\nThis line ends well.")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(3)) === 0, lit("\nno terminal punctuation here")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(4)) === 0, lit("\nAnother good sentence!")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(11)) === 0, lit("\nLorem ipsum dolor sit.")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(13)) === 0, lit("\ncode { block }")).otherwise(lit("")))
  private val c4EnrichedSql =
    """text
       || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'This line ends well.' ELSE '' END
       || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'no terminal punctuation here' ELSE '' END
       || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'Another good sentence!' ELSE '' END
       || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'Lorem ipsum dolor sit.' ELSE '' END
       || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'code { block }' ELSE '' END"""

  def textC4FiltersQ(s: SparkSession, dir: String): DataFrame = {
    val feats = TextOps.c4Features(c4Enriched)
    docs(s, dir).select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
  }
  val textC4FiltersSql: String =
    s"""WITH m AS (SELECT doc_id, $c4EnrichedSql AS mtext FROM documents),
       l AS (SELECT doc_id, mtext, string_split(mtext, chr(10)) AS lines,
               CAST(len(list_filter(string_split(mtext, chr(10)),
                 x -> regexp_matches(trim(x), '[.!?"'']$$'))) AS BIGINT) AS nk,
               contains(lower(mtext), 'lorem ipsum') AS hl,
               contains(mtext, '{') AS hb
             FROM m)
       SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         nk AS n_kept_lines,
         CAST(len(regexp_extract_all(mtext, '[.!?]')) AS BIGINT) AS n_sentences,
         hl AS has_lorem,
         hb AS has_brace,
         (nk >= 2 AND NOT hl AND NOT hb) AS keep
       FROM l ORDER BY doc_id""".replaceAll("\\s+", " ")

  private def piiEnriched = concat(col("text"),
    when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit(" Contact user"), col("doc_id").cast("string"), lit("@example.com now."))).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(5)) === 0,
      concat(lit(" Host 10.0."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".7 responded."))).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(7)) === 0,
      concat(lit(" Call +1 555 010 "), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"), lit(" today."))).otherwise(lit("")))
  private val piiEnrichedSql =
    """text
       || CASE WHEN doc_id % 3 = 0 THEN ' Contact user' || doc_id::VARCHAR || '@example.com now.' ELSE '' END
       || CASE WHEN doc_id % 5 = 0 THEN ' Host 10.0.' || (doc_id % 256)::VARCHAR || '.7 responded.' ELSE '' END
       || CASE WHEN doc_id % 7 = 0 THEN ' Call +1 555 010 ' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' today.' ELSE '' END"""

  def textPiiQ(s: SparkSession, dir: String): DataFrame = {
    val feats = TextOps.piiFeatures(piiEnriched)
    docs(s, dir).select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
  }
  val textPiiSql: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\+?\\d[\\d\\- ]{7,}\\d"
    s"""WITH m AS (SELECT doc_id, $piiEnrichedSql AS mtext FROM documents),
       c AS (SELECT doc_id, mtext,
               CAST(len(regexp_extract_all(mtext, '$email')) AS BIGINT) AS ne,
               CAST(len(regexp_extract_all(mtext, '$ip')) AS BIGINT) AS ni,
               CAST(len(regexp_extract_all(mtext, '$phone')) AS BIGINT) AS np
             FROM m)
       SELECT doc_id, ne AS n_emails, ni AS n_ipv4, np AS n_phones,
         (ne + ni + np > 0) AS has_pii,
         md5(regexp_replace(regexp_replace(mtext, '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g')) AS redacted_md5
       FROM c ORDER BY doc_id""".replaceAll("\\s+", " ")
  }

  // ------------------------------------------------- shuffle + sharding

  /** q_source_overlap: the cross-source duplicate-overlap matrix
    * (Report.sourceOverlap) — cross-source exact duplicates are planted
    * deterministically (every 17th doc collapses to one of five shared
    * blocks) so pairs overlap on both sides identically. */
  def sourceOverlapQ(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir).select(col("source"),
      when(pmod(col("doc_id"), lit(17)) === 0,
        concat(lit("shared corpus text block "),
          pmod(col("doc_id"), lit(5)).cast("string")))
        .otherwise(col("text")).as("text"))
    graft.llm.Report.sourceOverlap(planted, "text", "source")
      .orderBy("src_a", "src_b")
  }
  val sourceOverlapSql: String =
    s"""WITH m AS (SELECT source,
         CASE WHEN doc_id % 17 = 0
              THEN 'shared corpus text block ' || CAST(doc_id % 5 AS VARCHAR)
              ELSE text END AS mtext
       FROM documents),
       h AS (SELECT DISTINCT source, ${h60sql("coalesce(mtext, '')")} AS th FROM m),
       cnt AS (SELECT source, count(*) AS n FROM h GROUP BY 1),
       p AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS overlap
             FROM h a JOIN h b ON a.th = b.th AND a.source < b.source
             GROUP BY 1, 2)
       SELECT src_a, src_b, overlap, ca.n AS n_a, cb.n AS n_b,
              round(CAST(overlap AS DOUBLE) / (ca.n + cb.n - overlap), 6) AS jaccard
       FROM p JOIN cnt ca ON ca.source = src_a
              JOIN cnt cb ON cb.source = src_b
       ORDER BY src_a, src_b""".replaceAll("\\s+", " ")

  /** q_embed_outliers: embedding-space outlier detection
    * (Similarity.embedOutliers) — nearest-literal-centroid assignment,
    * then a z-score on the cosine-to-own-center over exact integer
    * cluster moments; z ≤ −2 flags the vector. The oracle restates the
    * assignment, the integer sums, and the identical double formula. */
  def embedOutliersQ(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val centroids = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    graft.llm.Similarity.embedOutliers(e, "vec_id", "embedding", centroids,
        zThreshold = 2.0)
      .orderBy("vid")
  }
  val embedOutliersSql: String = {
    val cosExpr = s"round(${dotSql("n.embedding", "cvec")} / (n.nrm * cnrm), 6)"
    s"""WITH $normCte,
       c AS (SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm FROM n WHERE vec_id < 8),
       asg AS (SELECT n.vec_id AS vid, cid,
               CAST(round($cosExpr * 1000000) AS BIGINT) AS c6
               FROM n CROSS JOIN c
               QUALIFY row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY $cosExpr DESC, cid) = 1),
       st AS (SELECT cid, count(*) AS cnt, CAST(sum(c6) AS BIGINT) AS s,
              CAST(sum(c6 * c6) AS BIGINT) AS ss FROM asg GROUP BY 1),
       zz AS (SELECT vid, a.cid, c6,
              CASE WHEN cnt < 2 OR (CAST(cnt AS DOUBLE) * CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) <= 0 THEN 0.0
                   ELSE (CAST(c6 AS DOUBLE) - CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE))
                        / sqrt((CAST(cnt AS DOUBLE) * CAST(ss AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                               / (CAST(cnt AS DOUBLE) * (CAST(cnt AS DOUBLE) - 1))) END AS zs
              FROM asg a JOIN st USING (cid))
       SELECT vid, CAST(cid AS INT) AS cid, c6 / 1000000.0 AS cos,
              round(zs, 6) AS z, round(zs, 6) <= -2.0 AS outlier
       FROM zz ORDER BY vid""".replaceAll("\\s+", " ")
  }

  /** q_split_assign: deterministic train/val/test assignment
    * (Mix.assignSplit) — 90/5/5 via md5-bucket thresholds, remainder to
    * the catch-all last split. */
  def splitAssignQ(s: SparkSession, dir: String): DataFrame =
    graft.llm.Mix.assignSplit(docs(s, dir), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .select(col("doc_id"), col("split"))
      .orderBy("doc_id")
  val splitAssignSql: String =
    """WITH b AS (SELECT doc_id,
         ('0x' || substr(md5('42:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS sb
       FROM documents)
       SELECT doc_id,
         CASE WHEN sb < 9000 THEN 'train'
              WHEN sb < 9500 THEN 'val'
              ELSE 'test' END AS split
       FROM b ORDER BY doc_id""".replaceAll("\\s+", " ")

  /** q_shard_assign: deterministic global shuffle into 16 training shards
    * with within-shard positions (graft.llm.Mix.shuffleShards). */
  def shardAssignQ(s: SparkSession, dir: String): DataFrame =
    graft.llm.Mix.shuffleShards(docs(s, dir), "doc_id", numShards = 16)
      .select(col("doc_id"), col("shard"), col("shard_pos"))
      .orderBy("doc_id")
  val shardAssignSql: String =
    """WITH b AS (SELECT doc_id, md5('42:' || doc_id::VARCHAR) AS key FROM documents),
       k AS (SELECT doc_id, key,
               CAST(('0x' || substr(key, 1, 8))::BIGINT % 16 AS INT) AS shard
             FROM b)
       SELECT doc_id, shard,
         CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1 AS BIGINT) AS shard_pos
       FROM k ORDER BY doc_id""".replaceAll("\\s+", " ")

  // --------------------------------------------------- stratified sampling

  /** q_sample_stratified: deterministic domain-weighted corpus mixing —
    * per-source keep rates resolved through the md5 sampling bucket
    * (graft.llm.Mix), reproducible across engines and partitionings. */
  def sampleStratifiedQ(s: SparkSession, dir: String): DataFrame =
    graft.llm.Mix.stratifiedSample(docs(s, dir), "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1),
        defaultRate = 0.05)
      .select(col("doc_id"), col("source"), col("sample_bucket"))
      .orderBy("doc_id")
  val sampleStratifiedSql: String =
    """WITH b AS (SELECT doc_id, source,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS sample_bucket
       FROM documents)
       SELECT doc_id, source, sample_bucket FROM b
       WHERE sample_bucket < CASE source
         WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
         WHEN 'src2' THEN 2500 WHEN 'src3' THEN 1000 ELSE 500 END
       ORDER BY doc_id""".replaceAll("\\s+", " ")

  /** q_mix_upsample: fractional domain repeat factors — src0 is seen 2.3×
    * (2 whole epochs + a deterministic 30% third), src1 halved, everything
    * else passed through once. The copy index is materialized as `epoch`. */
  def mixUpsampleQ(s: SparkSession, dir: String): DataFrame =
    graft.llm.Mix.upsample(docs(s, dir), "doc_id", "source",
        Map("src0" -> 2.3, "src1" -> 0.5), defaultRepeat = 1.0)
      .select(col("doc_id"), col("source"), col("epoch"))
      .orderBy("doc_id", "epoch")
  val mixUpsampleSql: String =
    """WITH b AS (SELECT doc_id, source,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS bucket,
         CASE source WHEN 'src0' THEN 23000 WHEN 'src1' THEN 5000 ELSE 10000 END AS myriad
       FROM documents),
       c AS (SELECT doc_id, source,
         (myriad // 10000) + CASE WHEN bucket < myriad % 10000 THEN 1 ELSE 0 END AS copies
       FROM b)
       SELECT doc_id, source, CAST(unnest(range(copies)) AS INTEGER) AS epoch
       FROM c WHERE copies > 0 ORDER BY doc_id, epoch""".replaceAll("\\s+", " ")

  // ---------------------------------------------------------- token counts

  def textTokensQ(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextOps.wsTokenCount(col("text")).as("ws_tokens"),
      TextOps.bpeishTokenCount(col("text")).as("bpeish_tokens"),
      TextOps.approxTokenCount(col("text")).as("approx_tokens"))
      .orderBy("doc_id")
  val textTokensSql: String =
    s"""WITH $tokSql
       SELECT d.doc_id,
         CAST(len(toks) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpeish_tokens,
         CAST(ceil(CAST(length(text) AS DOUBLE) / 4) AS BIGINT) AS approx_tokens
       FROM documents d JOIN tok USING (doc_id) ORDER BY doc_id""".replaceAll("\\s+", " ")

  // ---------------------------------------------------------- fingerprints

  def textFingerprintQ(s: SparkSession, dir: String): DataFrame = {
    val fp = TextOps.fingerprint(col("text"), 4)
    docs(s, dir).select(
      col("doc_id"),
      try_element_at(fp, lit(1)).as("fp1"),
      try_element_at(fp, lit(2)).as("fp2"),
      try_element_at(fp, lit(3)).as("fp3"),
      try_element_at(fp, lit(4)).as("fp4"))
      .orderBy("doc_id")
  }
  val textFingerprintSql: String =
    s"""WITH $tokSql, $shSql,
       f AS (SELECT doc_id, list_sort(list_distinct(list_transform(s, x -> ${h60sql("x")}))) AS hs FROM sh)
       SELECT doc_id, hs[1] AS fp1, hs[2] AS fp2, hs[3] AS fp3, hs[4] AS fp4
       FROM f ORDER BY doc_id""".replaceAll("\\s+", " ")

  // ------------------------------------------------------- media chunking

  /** Multimodal-column plumbing, oracle-checkable slice: treat each
    * document's payload as an opaque blob, split it into fixed-size frames
    * and emit per-frame metadata (index, content hash, size) — the schema/
    * partitioning shape of an image/audio feature-extraction pass. The
    * decode itself is stubbed in graft.multimodal.Media (no codec libs in
    * this environment); the chunk plumbing here is the real, tested part. */
  def mediaChunksQ(s: SparkSession, dir: String): DataFrame = {
    val nChunks = greatest(ceil(length(col("text")).cast("double") / 128).cast("long"), lit(1L))
    docs(s, dir)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        md5(expr("substr(text, CAST(chunk_idx*128+1 AS INT), 128)")).as("chunk_md5"),
        length(expr("substr(text, CAST(chunk_idx*128+1 AS INT), 128)")).cast("long").as("chunk_chars"))
      .orderBy("doc_id", "chunk_idx")
  }
  val mediaChunksSql: String =
    """WITH c AS (SELECT doc_id, text,
         unnest(range(greatest(CAST(ceil(CAST(length(text) AS DOUBLE) / 128) AS BIGINT), 1))) AS chunk_idx
       FROM documents)
       SELECT doc_id, chunk_idx,
              md5(substr(text, CAST(chunk_idx*128+1 AS INT), 128)) AS chunk_md5,
              CAST(length(substr(text, CAST(chunk_idx*128+1 AS INT), 128)) AS BIGINT) AS chunk_chars
       FROM c ORDER BY doc_id, chunk_idx""".replaceAll("\\s+", " ")

  // ------------------------------------------------- perplexity filtering

  /** CCNet-style unigram perplexity scoring: top-256 vocabulary by
    * (count DESC, token ASC), Laplace smoothing with an OOV bucket,
    * per-document average negative log-likelihood (LangModel). */
  def textPerplexityQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val model = LangModel.unigramTrain(d, "text", topV = 256)
    LangModel.avgNll(d, "doc_id", "text", model).orderBy("doc_id")
  }
  val textPerplexitySql: String =
    s"""WITH $tokSql,
       tc AS (SELECT unnest(toks) AS token FROM tok),
       counts AS (SELECT token, count(*)::BIGINT AS cnt FROM tc GROUP BY 1),
       tot AS (SELECT sum(cnt)::BIGINT AS t FROM counts),
       vocab AS (SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 256),
       vn AS (SELECT count(*)::BIGINT AS v FROM vocab),
       m AS (SELECT map(list(token ORDER BY token),
                        list(ln((cnt + 1)::DOUBLE / (t + v + 1)::DOUBLE) ORDER BY token)) AS mp,
                    ln(1.0 / (t + v + 1)::DOUBLE) AS oov
             FROM vocab, tot, vn GROUP BY t, v)
       SELECT doc_id, len(toks)::BIGINT AS n_tok,
              round(-list_reduce(list_transform(toks, tk -> coalesce(map_extract(mp, tk)[1], oov)),
                    (a, b) -> a + b) / len(toks), 5) AS avg_nll
       FROM tok, m WHERE len(toks) > 0 ORDER BY doc_id""".replaceAll("\\s+", " ")

  /** Interpolated bigram-LM scoring (λ=0.7), the KenLM-shaped upgrade of
    * the unigram filter: top-256 vocab, top-1024 in-vocab bigrams. */
  def textBigramNllQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val model = LangModel.bigramTrain(d, "text", topV = 256, topB = 1024, lambda = 0.7)
    LangModel.avgNllBigram(d, "doc_id", "text", model).orderBy("doc_id")
  }
  val textBigramNllSql: String =
    // (1.0 - 0.7) stays an expression: both engines then mix with the
    // identical IEEE double 0.30000000000000004
    s"""WITH $tokSql,
       tc AS (SELECT unnest(toks) AS token FROM tok),
       counts AS (SELECT token, count(*)::BIGINT AS cnt FROM tc GROUP BY 1),
       tot AS (SELECT sum(cnt)::BIGINT AS t FROM counts),
       vocab AS (SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 256),
       vn AS (SELECT count(*)::BIGINT AS v FROM vocab),
       prs AS (SELECT toks[i] AS a, toks[i+1] AS b
               FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tok WHERE len(toks) > 1)),
       bc AS (SELECT a, b, count(*)::BIGINT AS cnt
              FROM prs JOIN vocab va ON va.token = prs.a JOIN vocab vb ON vb.token = prs.b
              GROUP BY 1, 2),
       topb AS (SELECT a, b, cnt FROM bc ORDER BY cnt DESC, a, b LIMIT 1024),
       mu AS (SELECT map(list(token ORDER BY token),
                         list((cnt + 1)::DOUBLE / (t + v + 1)::DOUBLE ORDER BY token)) AS mu,
                     1.0 / (t + v + 1)::DOUBLE AS oov
              FROM vocab, tot, vn GROUP BY t, v),
       mb AS (SELECT map(list(a || ' ' || b ORDER BY a, b),
                         list(topb.cnt::DOUBLE / va.cnt::DOUBLE ORDER BY a, b)) AS mb
              FROM topb JOIN vocab va ON va.token = topb.a)
       SELECT doc_id, len(toks)::BIGINT AS n_tok,
              round(-(ln(coalesce(map_extract(mu, toks[1])[1], oov)) +
                list_reduce(list_prepend(0.0, list_transform(range(1, len(toks)),
                  i -> ln(0.7 * coalesce(map_extract(mb, toks[i] || ' ' || toks[i+1])[1], 0.0)
                        + (1.0 - 0.7) * coalesce(map_extract(mu, toks[i+1])[1], oov)))),
                  (x, y) -> x + y)) / len(toks), 5) AS avg_nll
       FROM tok, mu, mb WHERE len(toks) > 0 ORDER BY doc_id""".replaceAll("\\s+", " ")

  // --------------------------------------------------------- SemDeDup

  /** Semantic dedup over embeddings: fixed coarse centroids (vec_id < 8,
    * the same deterministic model the IVF queries use), within-cluster
    * pairwise cosine, lower-id representative wins at threshold 0.42. */
  def dedupSemanticQ(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val centroids = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    Similarity.semanticDedup(e, "vec_id", "embedding", centroids, threshold = 0.42)
      .orderBy("vec_id")
  }
  val dedupSemanticSql: String =
    s"""WITH $normCte,
       c AS (SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm FROM n WHERE vec_id < 8),
       asg AS (SELECT n.vec_id AS vid, cid, n.embedding AS v, n.nrm AS nrm
               FROM n CROSS JOIN c
               QUALIFY row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY round(${dotSql("n.embedding", "cvec")} / (n.nrm * cnrm), 6) DESC, cid) = 1),
       dups AS (SELECT b.vid AS vid, min(a.vid) AS dup_of
                FROM asg a JOIN asg b ON a.cid = b.cid AND a.vid < b.vid
                WHERE round(${dotSql("a.v", "b.v")} / (a.nrm * b.nrm), 6) >= 0.42
                GROUP BY b.vid)
       SELECT asg.vid AS vec_id, asg.cid,
              coalesce(dups.dup_of, asg.vid) AS dup_of,
              dups.dup_of IS NOT NULL AS is_dup
       FROM asg LEFT JOIN dups ON asg.vid = dups.vid ORDER BY vec_id""".replaceAll("\\s+", " ")

  // --------------------------------------------------- sequence packing

  /** Concatenate-then-split packing into 512-token sequences per source
    * shard (Mix.packSequences). */
  def packSequencesQ(s: SparkSession, dir: String): DataFrame =
    graft.llm.Mix.packSequences(docs(s, dir), "doc_id", "text", "source", 512)
      .orderBy("doc_id")
  val packSequencesSql: String =
    s"""WITH $tokSql,
       d AS (SELECT t.doc_id, documents.source, len(toks)::BIGINT AS n_tok
             FROM tok t JOIN documents USING (doc_id) WHERE len(toks) > 0),
       c AS (SELECT doc_id, source, n_tok,
               sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok AS s
             FROM d)
       SELECT doc_id, source, n_tok, (s // 512)::BIGINT AS pack_id,
              (s % 512)::BIGINT AS pack_offset
       FROM c ORDER BY doc_id""".replaceAll("\\s+", " ")

  // ------------------------------------------------------------ TF-IDF

  /** Per-document top-3 TF-IDF keywords (TextOps.tfidfTopK). */
  def textTfidfQ(s: SparkSession, dir: String): DataFrame =
    TextOps.tfidfTopK(docs(s, dir), "doc_id", "text", 3).orderBy("doc_id", "rk")
  val textTfidfSql: String =
    s"""WITH $tokSql,
       tfl AS (SELECT doc_id, unnest(toks) AS term FROM tok),
       tfc AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tfl GROUP BY 1, 2),
       dfc AS (SELECT term, count(*)::BIGINT AS df FROM tfc GROUP BY 1),
       nn AS (SELECT count(*)::BIGINT AS n FROM documents),
       sc AS (SELECT doc_id, term, tf, df,
                round(tf * ln((n + 1)::DOUBLE / (df + 1)::DOUBLE), 6) AS score
              FROM tfc JOIN dfc USING (term), nn)
       SELECT doc_id,
              CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rk,
              term, tf, df, score
       FROM sc QUALIFY rk <= 3 ORDER BY doc_id, rk""".replaceAll("\\s+", " ")

  // ------------------------------------------------- learned classifier

  /** fastText-style classifier distillation, the CCNet deployment shape:
    * an expensive teacher (the unigram-LM perplexity filter) labels the
    * corpus — below-median avg_nll = "reference quality" — and a cheap
    * hashing-trick logistic regression learns to reproduce the verdict,
    * then scores everything shuffle-free. (The synthetic corpus's `lang`
    * column carries no textual signal, so the teacher is the honest
    * learnable label here.) Gradient descent is not SQL-expressible →
    * rows-only for the driver, like q_text_bpe; LlmSpec pins class
    * separation, distributed ≡ driver arithmetic, bit-stable retrains,
    * and ≥85% teacher agreement on this distillation (measured 91%). */
  def textClassifyQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val (model, med, teacher) = classifyModelFused(s, dir)
    val labeled = d.join(
      LangModel.avgNll(d, "doc_id", "text", teacher)
        .select(col("doc_id"), (col("avg_nll") <= med).cast("int").as("label")),
      "doc_id")
    classifyOracle = Some(classifySqlFor(model))
    graft.llm.Classifier.score(labeled, "text", model)
      .select(col("doc_id"), col("label").cast("long").as("label"),
        col("score"), (col("score") >= 0.5).as("pred"))
      .orderBy("doc_id")
  }

  /** The distillation driver work of q_text_classify in TWO jobs instead
    * of five (r22, guide §1.2 — the query's floor was serial driver
    * round-trips, not data): job 1 trains the unigram teacher
    * (LangModel's fused vocab+total collect), job 2 pulls the avg_nll
    * HISTOGRAM (boundedLowerMedian's exact input) and the md5-ordered
    * bounded training sample in one union collect; the driver then
    * computes the same lower median, labels the sample
    * (label = avg_nll <= med), re-establishes the md5 order and runs the
    * same bit-pinned GD. Model bits are IDENTICAL to the staged
    * median-join-collect chain — textClassifyCrossCheck replays that
    * staged chain in Verify and asserts score equality, and
    * NativeExprParitySpec pins fused ≡ staged weights directly. */
  private[graft] def classifyModelFused(s: SparkSession, dir: String):
      (graft.llm.Classifier.LogisticModel, Double, LangModel.UnigramModel) = {
    val d = docs(s, dir)
    val teacher = LangModel.unigramTrain(d, "text", topV = 256)
    val scored = LangModel.avgNll(d, "doc_id", "text", teacher)
    val maxSample = 65536
    val hist = scored.groupBy(col("avg_nll")).agg(count(lit(1)).as("__c"))
      .select(lit(0).as("__k"), lit(null).cast("string").as("__m"),
        lit(null).cast("string").as("__t"), col("avg_nll").as("__v"), col("__c"))
    val samp = d.join(scored.select(col("doc_id"), col("avg_nll")), "doc_id")
      .select(md5(col("doc_id").cast("string")).as("__m"),
        col("text").cast("string").as("__t"), col("avg_nll").as("__v"))
      .orderBy(col("__m")).limit(maxSample)
      .select(lit(1).as("__k"), col("__m"), col("__t"), col("__v"),
        lit(null).cast("long").as("__c"))
    val rows = hist.unionAll(samp).collect()
    // lower median over the rounded-score histogram: the first ascending
    // value whose cumulative count reaches half — boundedLowerMedian's
    // exact law, replayed on the collected histogram rows
    val histRows = rows.filter(_.getInt(0) == 0)
      .map(r => (r.getDouble(3), r.getLong(4))).sortBy(_._1)
    val tot = histRows.map(_._2).sum
    var cum = 0L
    var med = Double.NaN
    var found = false
    for ((v, c) <- histRows if !found) {
      cum += c
      if (2 * cum >= tot) { med = v; found = true }
    }
    require(found, "boundedLowerMedian(avg_nll): empty input")
    // the training sample in md5(sid)-ascending order (hex strings sort
    // identically as Java Strings and UTF8 binaries; ids are distinct so
    // there are no ties) — the exact fold order trainLogistic collects
    val sample = rows.filter(_.getInt(0) == 1)
      .map(r => (r.getString(1), r.getString(2), r.getDouble(3)))
      .sortBy(_._1)
      .map { case (_, t, nll) => (t, if (nll <= med) 1.0 else 0.0) }
    (graft.llm.Classifier.trainLogisticRows(
      sample, dim = 1 << 14, iters = 100), med, teacher)
  }

  /** DuckDB oracle for q_text_classify, GENERATED at query-construction
    * time with the trained weight vector embedded as literals. Gradient
    * descent itself is not SQL-expressible, but the model it produces is
    * a deterministic, bit-stable function of the corpus (LlmSpec pins the
    * retrain), and SCORING is pure arithmetic — the same
    * model-as-literals move the Spark plan makes, now made for the oracle
    * too, so the gate hash-checks the teacher labels AND the scoring fold
    * cross-engine. Verify runs every query before dumping
    * oracle_sql.json, so the cache always carries the weights trained on
    * the exact sfDir DuckDB reads; a dev-mode Verify that skipped
    * q_text_classify leaves the cache empty and the entry is omitted
    * (falls back to the old rows-only check). */
  @volatile private var classifyOracle: Option[String] = None
  def textClassifySqlOpt: Option[String] = classifyOracle

  private def classifySqlFor(model: graft.llm.Classifier.LogisticModel): String = {
    // only buckets a training token ever touched are nonzero (L2 decays
    // nothing that was never updated away from 0) — the literal map stays
    // vocabulary-sized, not dim-sized
    val nz = model.weights.zipWithIndex.collect { case (w, i) if w != 0.0 => (i, w) }
    require(nz.nonEmpty, "classifier weights are all zero — training did not run")
    // Double.toString round-trips, so DuckDB's correctly-rounded literal
    // parse lands on the identical IEEE bits
    val keys = nz.map(_._1).mkString("[", ",", "]")
    val vals = nz.map(p => java.lang.Double.toString(p._2)).mkString("[", ",", "]")
    val bias = java.lang.Double.toString(model.bias)
    val dim = model.dim
    // teacher = the unigram-perplexity CTEs (identical to
    // textPerplexitySql), LOWER median over the rounded avg_nll histogram,
    // label = avg_nll <= median; scoring folds the SORTED bucket list so
    // the FP accumulation order matches Classifier.score bit-for-bit
    s"""WITH $tokSql,
       tc AS (SELECT unnest(toks) AS token FROM tok),
       counts AS (SELECT token, count(*)::BIGINT AS cnt FROM tc GROUP BY 1),
       tot AS (SELECT sum(cnt)::BIGINT AS t FROM counts),
       vocab AS (SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 256),
       vn AS (SELECT count(*)::BIGINT AS v FROM vocab),
       m AS (SELECT map(list(token ORDER BY token),
                        list(ln((cnt + 1)::DOUBLE / (t + v + 1)::DOUBLE) ORDER BY token)) AS mp,
                    ln(1.0 / (t + v + 1)::DOUBLE) AS oov
             FROM vocab, tot, vn GROUP BY t, v),
       scored AS (SELECT doc_id, toks,
              round(-list_reduce(list_transform(toks, tk -> coalesce(map_extract(mp, tk)[1], oov)),
                    (a, b) -> a + b) / len(toks), 5) AS avg_nll
             FROM tok, m WHERE len(toks) > 0),
       hist AS (SELECT avg_nll, count(*)::BIGINT AS c FROM scored GROUP BY 1),
       med AS (SELECT min(avg_nll) AS mv FROM
                 (SELECT avg_nll, 2 * sum(c) OVER (ORDER BY avg_nll) >= (SELECT sum(c) FROM hist) AS ok
                  FROM hist) WHERE ok),
       wm AS (SELECT map($keys, ($vals)::DOUBLE[]) AS w, CAST($bias AS DOUBLE) AS bias),
       feats AS (SELECT doc_id, avg_nll,
                   list_sort(list_transform(toks, t -> ${h60sql("t")} % $dim)) AS bk
                 FROM scored),
       dots AS (SELECT doc_id, avg_nll,
                  list_reduce(list_transform(bk, b -> coalesce(map_extract(w, b)[1], 0.0)),
                    (a, c) -> a + c) AS rawdot
                FROM feats, wm),
       sq AS (SELECT doc_id, sum(c * c)::DOUBLE AS tfsq FROM
                (SELECT doc_id, b, count(*)::BIGINT AS c FROM
                  (SELECT doc_id, unnest(bk) AS b FROM feats) GROUP BY 1, 2)
              GROUP BY 1),
       fin AS (SELECT d.doc_id, (d.avg_nll <= med.mv)::BIGINT AS label,
                 round(1.0 / (1.0 + exp(-(d.rawdot / sqrt(s.tfsq) + wm.bias))), 5) AS score
               FROM dots d JOIN sq s USING (doc_id), med, wm)
       SELECT doc_id, label, score, (score >= 0.5) AS pred
       FROM fin ORDER BY doc_id""".replaceAll("\\s+", " ")
  }

  /** Exact LOWER median of a bounded-cardinality column (avg_nll is
    * rounded to 5 decimals over a ~[0, 30] NLL range, ≤ ~3M distinct
    * values by construction — the bound is now explicit, not an implicit
    * invariant of the rounding). Two map-side-combining steps: a
    * histogram groupBy, then a cumulative walk over the HISTOGRAM only —
    * no full-corpus values ever share one aggregation buffer, unlike the
    * single-group exact `percentile` this replaces. Deterministic, so the
    * distilled labels are bit-stable across retrains. */
  private[graft] def boundedLowerMedian(df: DataFrame, c: String): Double = {
    val hist = df.groupBy(col(c)).agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(c))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window.orderBy(col(c))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val row = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__tot", sum(col("__c")).over(all))
      .filter(col("__cum") * 2 >= col("__tot"))
      .agg(min(col(c))).head
    require(!row.isNullAt(0), s"boundedLowerMedian($c): empty input")
    row.getDouble(0)
  }

  // -------------------------------------------------------- BPE tokens

  /** Real subword tokenization: a 200-merge BPE model trained on the
    * corpus word-frequency dict (driver-bounded), applied distributed via
    * the native BpeEncode expression. TRAINING (the Sennrich merge loop)
    * is not SQL-expressible and stays LlmSpec/BpePropertySpec-gated, but
    * ENCODE is: with the trained merge table as rank-map literals (the
    * q_text_classify move), greedy lowest-rank-first merging is a
    * recursive CTE whose step folds the symbol list once per chosen pair
    * — so the oracle re-executes the whole encode cross-engine and the
    * gate hash-checks it. */
  def textBpeQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val model = Bpe.train(d, "text", numMerges = 200)
    bpeOracle = Some(bpeSqlFor(model))
    Bpe.encode(d, "text", model)
      .select(col("doc_id"),
        size(col("subwords")).cast("long").as("n_subwords"),
        md5(concat_ws(" ", col("subwords"))).as("subwords_md5"))
      .orderBy("doc_id")
  }

  /** Generated DuckDB oracle for q_text_bpe (see [[textBpeQ]]); cache
    * populated when the query runs, exactly like [[classifyOracle]]. */
  @volatile private var bpeOracle: Option[String] = None
  def textBpeSqlOpt: Option[String] = bpeOracle

  private def bpeSqlFor(model: graft.llm.Bpe.BpeModel): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    // rank map: 'a|b' → merge index ('|' never occurs in [a-z</w>] symbols)
    val keys = model.merges.map { case (a, b) => q(a + "|" + b) }.mkString("[", ",", "]")
    val vals = model.merges.indices.mkString("[", ",", "]")
    // The encode recursion, validated against Bpe.encodeWord on
    // adversarial rank tables (incl. a lower-rank pair that only exists
    // mid-merge — all-occurrence folding is load-bearing):
    //  - state = (word, symbol list); init = chars with EOW glued to the
    //    last (symbolsOf);
    //  - step: best = min-rank adjacent pair (leftmost on ties — tie
    //    identity is unique anyway); fold the list left-to-right merging
    //    every (a,b) adjacency. The fold's accumulator is a chr(1)-joined
    //    STRING because DuckDB 1.0's list_reduce silently corrupts
    //    list-valued struct accumulators; "last symbol == a" is the
    //    suffix test on the separator boundary, and a merged tail 'ab'
    //    can never re-trigger (ab ≠ a since b is non-empty) — exactly the
    //    reference loop's skip semantics;
    //  - terminal row per word = no adjacent pair has a rank.
    s"""WITH RECURSIVE $tokSql,
       rm AS (SELECT map($keys, $vals) AS m),
       w AS (SELECT DISTINCT unnest(toks) AS word FROM tok),
       init AS (SELECT word,
           list_concat(list_transform(range(length(word) - 1), i -> word[i+1:i+1]),
                       [word[length(word):length(word)] || '</w>']) AS syms
         FROM w),
       enc(word, syms) AS (
         SELECT word, syms FROM init
         UNION ALL
         SELECT word,
           string_split(list_reduce(syms,
             (acc, s) -> CASE WHEN s = best.b AND (acc = best.a OR ends_with(acc, chr(1) || best.a))
               THEN left(acc, length(acc) - length(best.a)) || best.a || best.b
               ELSE acc || chr(1) || s END), chr(1))
         FROM (
           SELECT word, syms,
             list_reduce(list_transform(range(len(syms) - 1),
               i -> struct_pack(r := coalesce(map_extract(m, syms[i+1] || '|' || syms[i+2])[1], 2147483647),
                                a := syms[i+1], b := syms[i+2])),
               (x, y) -> CASE WHEN y.r < x.r THEN y ELSE x END) AS best
           FROM enc, rm WHERE len(syms) > 1)
         WHERE best.r < 2147483647),
       term AS (SELECT word, syms FROM enc, rm
         WHERE len(syms) <= 1 OR list_min(list_transform(range(len(syms) - 1),
           i -> coalesce(map_extract(m, syms[i+1] || '|' || syms[i+2])[1], 2147483647))) = 2147483647),
       sub AS (SELECT word, array_to_string(syms, ' ') AS sw, len(syms)::BIGINT AS ns FROM term),
       pd AS (SELECT doc_id, i, toks[i+1] AS word
              FROM (SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM tok)),
       j AS (SELECT doc_id, i, sw, ns FROM pd JOIN sub USING (word))
       SELECT t.doc_id, coalesce(sum(j.ns), 0)::BIGINT AS n_subwords,
              md5(coalesce(string_agg(j.sw, ' ' ORDER BY j.i), '')) AS subwords_md5
       FROM tok t LEFT JOIN j USING (doc_id)
       GROUP BY t.doc_id ORDER BY t.doc_id""".replaceAll("\\s+", " ")
  }

  // ------------------------------------------------- curation pipeline

  /** q_pipeline_curate: the END-TO-END curation recipe (Pipeline.curate)
    * over `documents`, oracle-checked as one composed chain — Gopher rule
    * thresholds → cross-document paragraph dedup → perplexity filter
    * (unigram LM, cap 3.47: cuts the high-NLL tail while keeping enough
    * planted near-dup pair members that the near-dup stage stays active)
    * → exact dedup → MinHash near-dup keep-best → benchmark
    * decontamination (the %97 ENRICHED slice as the held-out set) →
    * stratified domain mixing → sequence packing. Language/C4 heuristics
    * are off here: the synthetic corpus is punctuation-free word salad
    * (C4 keep would empty it) and both detectors have their own green
    * rows (q_text_langid, q_text_c4filters). The corpus is enriched
    * IDENTICALLY on both sides (the q_text_gopher/q_dedup_paragraphs
    * planting convention): a stopword-bearing line on 9/10 docs (so the
    * Gopher stop-hit rule is active, dropping the tenth), a per-mod-7
    * boilerplate line on every 3rd doc and a license line on every 5th
    * (so paragraph dedup genuinely rewrites text — at sf0.01 it edits
    * 346/347 gopher survivors). Every stage's oracle fragment already
    * exists standalone; this entry pins their COMPOSITION, including the
    * survivor-set scoping (paragraph dup-lines chosen among GOPHER
    * survivors, LM trained on the paragraph-rewritten corpus, exact-dedup
    * canon among perplexity survivors, near-dup pairs among exact
    * survivors, packing token counts from the REWRITTEN text). */
  /** Exposed for tools.CurateStages (the per-stage adjudication tool must
    * time the EXACT gate corpus). */
  private[graft] def curateEnrichedCol = curateEnriched
  private def curateEnriched = concat(col("text"),
    when(pmod(col("doc_id"), lit(10)) =!= 0,
      lit("\nthe cost of that update have to land with and be near")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit("\nshared boilerplate block "),
        pmod(col("doc_id"), lit(7)).cast("string"))).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(5)) === 0,
      lit("\nlicense text common to all documents")).otherwise(lit("")))
  private val curateEnrichedSql =
    """text
       || CASE WHEN doc_id % 10 <> 0 THEN chr(10) || 'the cost of that update have to land with and be near' ELSE '' END
       || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'shared boilerplate block ' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END
       || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'license text common to all documents' ELSE '' END"""
  def pipelineCurateQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("doc_id"), col("source"), curateEnriched.as("text"))
    graft.llm.Pipeline.curate(d, "doc_id", "text", "source",
      graft.llm.Pipeline.CurationConfig(
        langs = Set.empty, requireC4Keep = false,
        gopherRules = true, paragraphDedup = true,
        maxAvgNll = Some(3.47), perplexityVocab = 256,
        nearDup = true,
        benchmark = Some(d.filter(col("doc_id") % 97 === 0)),
        contaminationN = 3, minOverlap = 3L,
        mixRates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1),
        defaultMixRate = 0.5, seqLen = 512))
      .orderBy("doc_id")
  }
  val pipelineCurateSql: String = {
    val sigList = graft.llm.TextOps.minhashConsts(16).map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ((h >> 30) * $a + (h & 1073741823) * $b) % ${graft.llm.TextOps.mixPrime}))"
    }.mkString("[", ", ", "]")
    val stops = graft.llm.TextOps.gopherStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH RECURSIVE m AS (SELECT doc_id, source, $curateEnrichedSql AS text FROM documents),
       gt AS (SELECT doc_id, text AS mtext,
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '') AS toks,
               string_split(text, chr(10)) AS lines
             FROM m),
       gop AS (SELECT doc_id FROM gt WHERE
               len(toks) BETWEEN 50 AND 100000
           AND CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / greatest(len(toks),1) BETWEEN 3 AND 10
           AND (CAST(length(mtext) - length(regexp_replace(mtext, '#', '', 'g')) AS DOUBLE)
                + CAST(length(mtext) - length(regexp_replace(mtext, '\\.\\.\\.', '', 'g')) AS DOUBLE) / 3)
               / greatest(len(toks),1) <= 0.1
           AND CAST(len(list_filter(lines, x -> regexp_matches(x, '^\\s*[-*•]'))) AS DOUBLE) / greatest(len(lines),1) <= 0.9
           AND CAST(len(list_filter(lines, x -> regexp_matches(x, '\\.\\.\\.\\s*$$'))) AS DOUBLE) / greatest(len(lines),1) <= 0.3
           AND CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / greatest(len(toks),1) >= 0.8
           AND CAST(len(list_distinct(list_filter(toks, t -> t IN ($stops)))) AS BIGINT) >= 2),
       px AS (SELECT g.doc_id, lines, unnest(range(1, len(lines) + 1)) AS p_idx
              FROM (SELECT m.doc_id, string_split(m.text, chr(10)) AS lines
                    FROM m JOIN gop USING (doc_id)) g),
       p AS (SELECT doc_id, p_idx, lines[p_idx] AS para FROM px),
       dl AS (SELECT md5(trim(para)) AS ph, min(doc_id) AS keep_doc
              FROM p WHERE trim(para) <> '' GROUP BY 1 HAVING min(doc_id) <> max(doc_id)),
       pj AS (SELECT p.doc_id, p.p_idx, p.para,
                     (dl.ph IS NULL OR dl.keep_doc = p.doc_id) AS keep
              FROM p LEFT JOIN dl ON trim(p.para) <> '' AND md5(trim(p.para)) = dl.ph),
       clean AS (SELECT doc_id,
                   coalesce(string_agg(para, chr(10) ORDER BY p_idx) FILTER (WHERE keep), '') AS text
                 FROM pj GROUP BY doc_id
                 HAVING trim(coalesce(string_agg(para, chr(10) ORDER BY p_idx) FILTER (WHERE keep), '')) <> ''),
       tok AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '') AS toks
               FROM clean),
       tc AS (SELECT unnest(toks) AS token FROM tok),
       counts AS (SELECT token, count(*)::BIGINT AS cnt FROM tc GROUP BY 1),
       tot AS (SELECT sum(cnt)::BIGINT AS t FROM counts),
       vocab AS (SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 256),
       vn AS (SELECT count(*)::BIGINT AS v FROM vocab),
       lm AS (SELECT map(list(token ORDER BY token),
                         list(ln((cnt + 1)::DOUBLE / (t + v + 1)::DOUBLE) ORDER BY token)) AS mp,
                     ln(1.0 / (t + v + 1)::DOUBLE) AS oov
              FROM vocab, tot, vn GROUP BY t, v),
       nll AS (SELECT doc_id,
                round(-list_reduce(list_transform(toks, tk -> coalesce(map_extract(mp, tk)[1], oov)),
                      (a, b) -> a + b) / len(toks), 5) AS avg_nll
              FROM tok, lm WHERE len(toks) > 0),
       ppl AS (SELECT doc_id FROM nll WHERE avg_nll <= 3.47),
       ex AS (SELECT doc_id FROM (
                SELECT c.doc_id,
                       c.doc_id = min(c.doc_id) OVER (PARTITION BY md5(c.text)) AS canon
                FROM clean c JOIN ppl USING (doc_id)) WHERE canon),
       sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
               THEN list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))
               ELSE [array_to_string(toks, ' ')] END) AS s FROM tok),
       hsc AS (SELECT sh.doc_id, list_transform(s, x -> ${h60sql("x")}) AS hs
               FROM sh JOIN ex USING (doc_id)),
       sig AS (SELECT doc_id, $sigList AS sig FROM hsc),
       band AS (SELECT doc_id, sig, b,
                 md5(b::VARCHAR || '|' || array_to_string(sig[b*4+1:b*4+4], ',')) AS bh
                FROM sig, (SELECT unnest(range(4)) AS b)),
       pp AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               round(CAST(len(list_filter(range(16), i -> a.sig[i+1] = b.sig[i+1])) AS DOUBLE) / 16, 6) AS est_jaccard
             FROM band a JOIN band b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
       pe AS (SELECT id_a, id_b FROM pp WHERE est_jaccard >= 0.5),
       e AS (SELECT id_a AS a, id_b AS b FROM pe
             UNION ALL SELECT id_b, id_a FROM pe),
       reach(a, b) AS (SELECT a, b FROM e
                       UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
       cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
       dropd AS (SELECT doc_id FROM (
                  SELECT cl.doc_id,
                         row_number() OVER (PARTITION BY cluster_id
                           ORDER BY length(c.text) DESC, cl.doc_id) AS rn
                  FROM cl JOIN clean c USING (doc_id)) WHERE rn > 1),
       nk AS (SELECT doc_id FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM dropd)),
       pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM tok JOIN nk USING (doc_id)),
       g AS (SELECT DISTINCT doc_id, ${h60sql("array_to_string(toks[i:i+2], ' ')")} AS gram FROM pos),
       btok AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '') AS toks
                FROM m WHERE doc_id % 97 = 0),
       bpos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM btok),
       bg AS (SELECT DISTINCT doc_id, ${h60sql("array_to_string(toks[i:i+2], ' ')")} AS gram FROM bpos),
       bad AS (SELECT DISTINCT c.doc_id
               FROM g c JOIN bg USING (gram)
               GROUP BY c.doc_id, bg.doc_id HAVING count(*) >= 3),
       decon AS (SELECT doc_id FROM nk WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
       mixed AS (SELECT d.doc_id, d.source
                 FROM m d JOIN decon USING (doc_id)
                 WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 10000 <
                   CASE d.source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
                     WHEN 'src2' THEN 2500 WHEN 'src3' THEN 1000 ELSE 5000 END),
       pk0 AS (SELECT t.doc_id, mx.source, len(t.toks)::BIGINT AS n_tok
               FROM tok t JOIN mixed mx USING (doc_id) WHERE len(t.toks) > 0),
       pk1 AS (SELECT doc_id, source, n_tok,
                sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok AS st
               FROM pk0)
       SELECT doc_id, source, n_tok, (st // 512)::BIGINT AS pack_id,
              (st % 512)::BIGINT AS pack_offset
       FROM pk1 ORDER BY doc_id""".replaceAll("\\s+", " ")
  }

  /** Verify-side value cross-check for q_text_bpe (rows-only for the
    * driver: greedy BPE is not SQL-expressible). Re-encodes EVERY document
    * on the driver with the serial Bpe.encodeWord and compares
    * (n_subwords, subwords_md5) bit-exactly against the distributed
    * native-BpeEncode output — the q_holt_winters pattern, so a hollow
    * rows-only pass is impossible. */
  def textBpeCrossCheck(s: SparkSession, dir: String): Boolean = {
    val d = docs(s, dir)
    val model = Bpe.train(d, "text", numMerges = 200)
    val got = textBpeQ(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = d.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      val subs = toks.flatMap(w => Bpe.encodeWord(w, model))
      md.reset()
      val hex = md.digest(subs.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (r.getLong(0), subs.length.toLong, hex)
    }.toSet
    val ok = got == expected
    if (!ok) {
      val diff = (got diff expected) ++ (expected diff got)
      System.err.println(s"[verify] bpe mismatch rows: ${diff.take(10).mkString(", ")}")
    }
    ok
  }

  /** Verify-side value cross-check for q_text_classify (rows-only:
    * gradient descent is not SQL-expressible). Replays the query's exact
    * teacher → median → distill chain (bit-stable by construction), then
    * asserts every distributed score EQUALS Classifier.scoreDriver's
    * driver arithmetic — same sorted-bucket fold, so equality, not
    * tolerance. */
  def textClassifyCrossCheck(s: SparkSession, dir: String): Boolean = {
    val d = docs(s, dir)
    val teacher = LangModel.unigramTrain(d, "text", topV = 256)
    val scored = LangModel.avgNll(d, "doc_id", "text", teacher)
    val med = boundedLowerMedian(scored, "avg_nll")
    val labeled = d.join(
      scored.select(col("doc_id"), (col("avg_nll") <= med).cast("int").as("label")),
      "doc_id")
    val model = graft.llm.Classifier.trainLogistic(
      labeled, "doc_id", "text", "label", dim = 1 << 14, iters = 100)
    val got = textClassifyQ(s, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val bad = d.select("doc_id", "text").collect().flatMap { r =>
      val id = r.getLong(0)
      val exact = graft.llm.Classifier.scoreDriver(r.getString(1), model)
      if (got.get(id).contains(exact)) None else Some((id, got.get(id), exact))
    }
    if (bad.nonEmpty)
      System.err.println(s"[verify] classify mismatch rows: ${bad.take(10).mkString(", ")}")
    bad.isEmpty
  }

  // ------------------------------------------------------- text chunking

  /** Token-window chunking with overlap (chunkLen 64, stride 48). */
  def textChunksQ(s: SparkSession, dir: String): DataFrame =
    TextOps.chunkDocs(docs(s, dir), "doc_id", "text", chunkLen = 64, stride = 48)
      .orderBy("doc_id", "chunk_id")
  val textChunksSql: String =
    s"""WITH $tokSql,
       st AS (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS s
              FROM tok WHERE len(toks) > 0)
       SELECT doc_id, (s // 48)::BIGINT AS chunk_id,
              len(toks[s+1:s+64])::BIGINT AS n_tok,
              md5(array_to_string(toks[s+1:s+64], ' ')) AS chunk_md5
       FROM st ORDER BY doc_id, chunk_id""".replaceAll("\\s+", " ")
}
