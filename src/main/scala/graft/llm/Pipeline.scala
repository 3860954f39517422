package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the operators of this package
  * composed in their canonical order (the C4/CCNet/Llama data-prep
  * recipe): language filter → heuristic quality filters → perplexity
  * filter → exact dedup → near-dup dedup (keep-best per cluster) →
  * benchmark decontamination → domain mixing → sequence packing.
  *
  * Each stage is one of the already-verified operators; this object only
  * wires them, so the composition inherits their scale shapes: per-row
  * filters fuse into one codegen'd pass over the scan, the dedup/
  * decontamination shuffles stay signature- and pair-sized, and the
  * models (unigram vocab) are bounded driver objects. Nothing here adds
  * a shuffle of its own.
  */
object Pipeline {

  /** Tunables with C4/CCNet-flavored defaults. `benchmark` enables the
    * decontamination stage; `mixRates` the per-domain downsampling.
    * `scrubSpans` switches decontamination from whole-document dropping
    * to span surgery (Decontaminate.decontaminateSpans): a contaminated
    * document survives with its benchmark-shared spans removed (fragments
    * rejoined with single spaces — the normalized token space every later
    * stage already works in), and drops only when nothing ≥
    * `minFragTokens` survives. */
  case class CurationConfig(
      langs: Set[String] = Set("en"),
      requireC4Keep: Boolean = true,
      maxAvgNll: Option[Double] = None,
      perplexityVocab: Int = 4096,
      nearDup: Boolean = true,
      gopherRules: Boolean = false,
      paragraphDedup: Boolean = false,
      spanDedup: Boolean = false,
      spanDedupN: Int = 8,
      benchmark: Option[DataFrame] = None,
      contaminationN: Int = 3,
      minOverlap: Long = 3L,
      scrubSpans: Boolean = false,
      spanMargin: Int = 0,
      minFragTokens: Int = 1,
      mixRates: Map[String, Double] = Map.empty,
      defaultMixRate: Double = 1.0,
      mixTokenBudgets: Map[String, Long] = Map.empty,
      defaultTokenBudget: Long = -1L,
      seqLen: Int = 512,
      materializeSurvivors: Boolean = true)

  /** Run the full recipe over (idCol, textCol, shardCol) documents.
    * Returns the packed survivor frame; `counters`, when provided,
    * receives per-stage survivor counts (one extra action per stage —
    * leave it None in production, the counts are for audits/tests). */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      cfg: CurationConfig = CurationConfig(),
      counters: Option[scala.collection.mutable.Map[String, Long]] = None): DataFrame = {
    def tap(name: String, df: DataFrame): DataFrame = {
      counters.foreach(_.update(name, df.count())); df
    }
    // Materialize each multi-pass stage's survivor-ID frame (narrow: the id
    // column only). Without this, stage N's plan embeds every prior stage's
    // full lineage and each downstream BRANCH (a self-join's two sides, an
    // eager model-training action, the final count) re-executes it — a
    // recompute cascade that is exponential in stage count (measured 4.1 s
    // vs ~2.5 s at sf0.1; at 100 TB it is the difference between ~one scan
    // per stage and re-running the whole upstream pipeline per branch).
    // localCheckpoint pins narrow frames on executors (8-byte ids, plus
    // one (id, toks) frame when the LM stage is active — see below) and
    // truncates lineage, so every stage replans as: docs scan → id join.
    // Per-row stages (language, C4, mixing thresholds) stay fused into the
    // scan — only stages whose operator shuffles get a checkpoint.
    def surv(ids: DataFrame): DataFrame =
      if (cfg.materializeSurvivors) ids.localCheckpoint() else ids
    val toks = TextOps.tokens(col(textCol))
    // stage 1+2: per-row filters — one fused scan pass
    val (langPred, _) = TextOps.langId(toks)
    val langOk = docs.filter(
      if (cfg.langs.isEmpty) lit(true) else langPred.isInCollection(cfg.langs))
    val heurOk = tap("heuristics", {
      if (!cfg.requireC4Keep) langOk
      else langOk.filter(TextOps.c4Features(col(textCol)).toMap.apply("keep"))
    })
    // Shared tokens: when the LM stage is active, tokens have three
    // corpus-wide consumers (LM train, LM scoring, packing) — materialize
    // (id, toks) ONCE from the filtered corpus and feed all three, instead
    // of re-tokenizing the text per stage (the r13 audit counted 4
    // redundant tokenize passes; at 100 TB each is a full-corpus CPU
    // pass). This checkpoint pins token arrays, not just ids — the
    // deliberate space-for-passes trade a production pipeline makes by
    // writing its filtered+tokenized corpus to parquet once.
    // Decontamination keeps its fused native ShingleHashes pass: its
    // tokenize is fused into the same partition-local shingle+hash loop,
    // so an array-input variant would add an expression without removing
    // a scan. With no LM stage, tokens have one consumer (packing) and
    // inline tokenization there is already the single pass.
    // stage 2b: Gopher rule thresholds — per-row, fused into the scan
    // like the C4 heuristics
    val gopherOk = tap("gopher", {
      if (!cfg.gopherRules) heurOk
      else heurOk.filter(TextOps.gopherRules(col(textCol)).toMap.apply("keep"))
    })
    // stage 2c: cross-document paragraph dedup — genuinely REWRITES the
    // text column (one corpus shuffle on the block hash), so it runs
    // before tokenization and its rewritten frame checkpoints like the
    // span surgeries; docs reduced to whitespace vanish via the join
    var toksFPre: Option[DataFrame] = None
    val cleanOk = tap("paragraph_dedup", {
      if (!cfg.paragraphDedup) gopherOk
      else {
        val deduped = Dedup.dedupParagraphs(gopherOk, idCol, textCol)
          .filter(length(trim(col("text"))) > 0)
          .select(col(idCol), col("text").as("__ptext"))
        // The join-back recovers the non-text columns. Its left side does
        // NOT need the filter chain re-applied: deduped's ids ARE
        // heuristic+gopher survivors (dedupParagraphs ran on gopherOk),
        // and ids are unique, so joining the RAW docs costs one projected
        // scan instead of a second enrich+gopher pass (gopherRules is the
        // heaviest per-row expression in the recipe — stopword sets +
        // line regexes).
        // Pin the JOINED cleaned corpus, not just the (id, ptext) side:
        // unpinned, every downstream stage and branch re-ran the join-back
        // (and with it the full filter chain). The two fixes together took
        // the gate query from 9.7 s to 4.9 s steady at sf0.1
        // (tools.CurateStages, repeat=8, fresh JVM); at 100 TB they are
        // the difference between re-filtering the raw corpus per stage
        // and reading the cleaned one. Same space-for-passes trade as the
        // shared-tokens checkpoint — production writes its cleaned corpus
        // to parquet exactly once.
        val joined = docs.drop(textCol).join(deduped, Seq(idCol))
          .withColumnRenamed("__ptext", textCol)
        if (cfg.maxAvgNll.isEmpty) surv(joined)
        else {
          // LM stage active: tokenize INSIDE the same checkpoint job, so
          // ONE materialization pins the cleaned corpus and its token
          // arrays together (r22 — the (id, toks) frame used to be a
          // second serial checkpoint re-reading the frame this job just
          // pinned; same pinned bytes either way, one fewer pass+job).
          // Downstream text consumers project __toks away at the pinned
          // scan, so no join or shuffle ever carries the arrays.
          val wide = surv(joined.withColumn("__toks", toks))
          toksFPre = Some(wide.select(col(idCol), col("__toks")))
          wide.drop("__toks")
        }
      }
    })
    val toksF: Option[DataFrame] = cfg.maxAvgNll.map { _ =>
      toksFPre.getOrElse(surv(cleanOk.select(col(idCol), toks.as("__toks"))))
    }
    // stage 3: perplexity filter (model trained on the surviving corpus)
    val pplOk = tap("perplexity", (cfg.maxAvgNll, toksF) match {
      case (Some(cap), Some(tf)) =>
        val model = LangModel.unigramTrainToks(tf, "__toks", cfg.perplexityVocab)
        cleanOk.join(
          surv(LangModel.avgNllToks(tf, idCol, "__toks", model)
            .filter(col("avg_nll") <= cap).select(idCol)),
          idCol)
      case _ => cleanOk
    })
    // stage 4: exact dedup (keep canonical copies)
    val exactKept = tap("exact_dedup", pplOk
      .join(surv(Dedup.exact(pplOk, idCol, textCol)
        .filter(!col("is_dup")).select(idCol)), idCol))
    // stage 5: near-dup clusters, keep-best per cluster
    val nearKept = tap("near_dedup", {
      if (!cfg.nearDup) exactKept
      else {
        // single-consumer pair stream: connectedComponents' probe is the
        // only action that reads the pairs, so skip minhashLsh's
        // decoupling checkpoint (one whole serial materialization) and
        // release the signature persist once keepBest's clusters exist —
        // its output frame is clusters ⋈ weights, independent of the
        // signatures (r22; identical pair set ⟹ identical clusters)
        val (pairs, banded) = Dedup.minhashLshParts(exactKept, idCol, textCol)
        val kept = Dedup.keepBest(
          exactKept.withColumn("__len", length(col(textCol))),
          pairs, idCol = idCol, weightCol = "__len")
        banded.unpersist(false)
        val drop = surv(kept.filter(!col("keep")).select(col("doc_id").as(idCol)))
        exactKept.join(drop, Seq(idCol), "left_anti")
      }
    })
    // Fragment reassembly shared by the two span-surgery stages: rejoin a
    // doc's surviving fragments in document order (single spaces — the
    // normalized token space every later stage works in); docs with zero
    // surviving fragments vanish via the inner join. The checkpoint
    // carries rewritten text (not just ids) — the surgery genuinely
    // rewrites the column, so there is no narrower frame to pin. The
    // fragment token counts are exact for the rejoined text, so packing
    // can reuse them instead of re-tokenizing.
    def reassemble(frags: DataFrame): DataFrame = surv(frags.groupBy(idCol).agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("frag_idx"), col("frag_text")))),
          s => s.getField("frag_text")),
        " ").as("__re_text"),
      sum("n_tok").cast("long").as("__re_ntok")))
    def rewrite(base: DataFrame, re: DataFrame): DataFrame =
      base.drop(textCol).join(re.select(col(idCol), col("__re_text").as(textCol)), Seq(idCol))
    // stage 5b: cross-document duplicate-SPAN removal (exact substring
    // dedup, Lee et al.) — after whole-doc dedup, cut any n-gram run
    // that still appears in ANOTHER surviving document (boilerplate,
    // quoted passages), keeping the smallest-id copy; a doc with nothing
    // ≥ minFragTokens left vanishes
    var spanNTok: Option[DataFrame] = None
    val spanKept = tap("span_dedup", {
      if (!cfg.spanDedup) nearKept
      else {
        val re = reassemble(Dedup.dedupSpans(nearKept, idCol, textCol,
          n = cfg.spanDedupN, minKeepTokens = cfg.minFragTokens))
        spanNTok = Some(re.select(col(idCol), col("__re_ntok").as("n_tok")))
        rewrite(nearKept, re)
      }
    })
    // stage 6: benchmark decontamination — drop whole docs, or (scrub
    // mode) cut only the contaminated spans and keep the rest
    var scrubNTok: Option[DataFrame] = None
    val decon = tap("decontaminated", cfg.benchmark match {
      case None => spanKept
      case Some(bench) if cfg.scrubSpans =>
        val re = reassemble(Decontaminate.decontaminateSpans(
          spanKept, bench, idCol, textCol,
          n = cfg.contaminationN, margin = cfg.spanMargin,
          minKeepTokens = cfg.minFragTokens, minOverlap = cfg.minOverlap))
        scrubNTok = Some(re.select(col(idCol), col("__re_ntok").as("n_tok")))
        rewrite(spanKept, re)
      case Some(bench) =>
        val bad = surv(Decontaminate.contamination(spanKept, bench, idCol, textCol,
          n = cfg.contaminationN, minOverlap = cfg.minOverlap)
          .select(col("doc_id").as(idCol)).distinct())
        spanKept.join(bad, Seq(idCol), "left_anti")
    })
    // stage 7: deterministic domain mixing — by rate (stratifiedSample) or
    // by TOKEN budget (tokenBudgetSample, the fill-then-cut convention);
    // budget mixing wins when configured, and its exact per-doc token
    // counts feed packing directly (one tokenize, not two)
    var budgetNTok: Option[DataFrame] = None
    val mixed = tap("mixed", {
      if (cfg.mixTokenBudgets.nonEmpty || cfg.defaultTokenBudget >= 0) {
        val tb = Mix.tokenBudgetSample(decon, idCol, textCol, shardCol,
          cfg.mixTokenBudgets, cfg.defaultTokenBudget)
        budgetNTok = Some(tb.select(col(idCol), col("n_tok")))
        tb.drop("n_tok", "tok_start")
      }
      else if (cfg.mixRates.isEmpty && cfg.defaultMixRate >= 1.0) decon
      else Mix.stratifiedSample(decon, idCol, shardCol, cfg.mixRates, cfg.defaultMixRate)
    })
    // stage 8: pack into fixed token sequences per shard — token counts
    // come from the LATEST stage that rewrote or re-counted the text
    // (budget mixing counts the final text; the scrub stage rewrites
    // post-span-dedup text; span dedup rewrites post-near-dup text — in
    // each case every earlier count is stale for the rewritten docs),
    // else from the shared tokens frame; all are id equi-joins, no
    // re-tokenize
    tap("packed", budgetNTok.orElse(scrubNTok).orElse(spanNTok).orElse(
      toksF.map(tf => tf.select(col(idCol), size(col("__toks")).cast("long").as("n_tok")))) match {
      case Some(counts) =>
        Mix.packSequencesCounted(
          mixed.select(col(idCol), col(shardCol)).join(counts, Seq(idCol)),
          idCol, shardCol, "n_tok", cfg.seqLen)
      case None => Mix.packSequences(mixed, idCol, textCol, shardCol, cfg.seqLen)
    })
  }
}
