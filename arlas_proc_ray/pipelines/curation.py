"""End-to-end training-data curation: the pipeline a 100-TB corpus run
actually executes, composed from this repo's first-class operators.

  docs ──quality metrics (pure Arrow)──▶ length/punct/token stats
       ──quality filter (vectorized predicate)──▶ drop junk
       ──language ID (vectorized actor stage)──▶ keep wanted languages
       ──exact dedup (sha256 keep-first)──▶ unique content
       ──MinHash-LSH near-dup + components──▶ one survivor per cluster
       ──token counting──▶ corpus token budget

Every stage streams (no driver materialization); the dedup phase is the
distributed-verify path. Stats are scalar counts only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class CurationConfig:
    min_tokens: int = 5
    max_tokens: int = 1_000_000
    max_punct_ratio: float = 0.30
    min_mean_token_len: float = 2.0
    languages: tuple[str, ...] | None = None  # None → keep all incl. unknown
    min_lang_score: float = 0.0
    jaccard_threshold: float = 0.8
    num_partitions: int = 16
    concurrency: int | None = None
    text_col: str = "text"
    id_col: str = "doc_id"
    # LM-perplexity gate (functions/lm.py): None disables. The bigram
    # model trains on the QUALITY-FILTERED stream itself (self-trained
    # reference corpus — the standard bootstrap when no external
    # reference exists), then drops documents the model finds
    # implausible. NaN (empty) docs drop with the gate on.
    max_perplexity: float | None = None
    lm_vocab_size: int = 30_000
    lm_k: float = 0.5
    # domain-mixture resampling (stages/sampling.py mixture_sample):
    # None disables. Runs LAST (over dedup survivors) so the mixture is
    # computed on what actually ships; token-weighted by n_tokens.
    mixture_weights: dict | None = None
    mixture_domain_col: str = "lang_pred"
    mixture_budget: int | None = None  # target tokens; None = max feasible


def quality_filter_expr(table: pa.Table, cfg: CurationConfig) -> pa.Table:
    """Vectorized quality predicate over the metrics columns (Arrow)."""
    keep = pc.and_(
        pc.and_(
            pc.greater_equal(table.column("n_tokens"), pa.scalar(cfg.min_tokens)),
            pc.less_equal(table.column("n_tokens"), pa.scalar(cfg.max_tokens)),
        ),
        pc.and_(
            pc.less_equal(
                table.column("punct_ratio"), pa.scalar(cfg.max_punct_ratio)
            ),
            pc.greater_equal(
                table.column("mean_token_len"), pa.scalar(cfg.min_mean_token_len)
            ),
        ),
    )
    return table.filter(keep)


def curate_documents(ds, cfg: CurationConfig | None = None):
    """Run the full curation chain; returns (survivors_ds, stats dict).

    ``survivors_ds`` carries the original columns plus quality metrics,
    ``lang_pred``/``lang_score``, ``dup_cluster_id`` and ``n_tokens``;
    ``stats`` records per-stage counts and the surviving token budget.
    """
    from arlas_proc_ray.dedup.pipeline import dedup_documents
    from arlas_proc_ray.functions.text import quality_metrics, score_lang_batch

    cfg = cfg or CurationConfig()
    stats: dict = {"input_docs": ds.count()}

    scored = ds.map_batches(
        lambda t: quality_metrics(t, cfg.text_col), batch_format="pyarrow",
        batch_size=None,
    )
    filtered = scored.map_batches(
        lambda t: quality_filter_expr(t, cfg), batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    stats["after_quality"] = filtered.count()

    langed = filtered.map_batches(score_lang_batch, batch_format="pandas", batch_size=None)
    if cfg.languages is not None:
        wanted = tuple(cfg.languages)

        def lang_keep(pdf):
            m = pdf["lang_pred"].isin(wanted) & (
                pdf["lang_score"] >= cfg.min_lang_score
            )
            return pdf[m]

        langed = langed.map_batches(lang_keep, batch_format="pandas", batch_size=None)
    langed = langed.materialize()
    stats["after_language"] = langed.count()

    if cfg.max_perplexity is not None:
        from arlas_proc_ray.functions.lm import (
            perplexity_filter,
            train_bigram_lm,
        )

        model = train_bigram_lm(
            langed,
            text_col=cfg.text_col,
            vocab_size=cfg.lm_vocab_size,
            k=cfg.lm_k,
        )
        langed = perplexity_filter(
            langed,
            model,
            text_col=cfg.text_col,
            max_perplexity=cfg.max_perplexity,
        ).materialize()
        stats["after_perplexity"] = langed.count()

    survivors, dedup_stats = dedup_documents(
        langed,
        text_col=cfg.text_col,
        id_col=cfg.id_col,
        jaccard_threshold=cfg.jaccard_threshold,
        num_partitions=cfg.num_partitions,
        concurrency=cfg.concurrency,
    )
    survivors = survivors.materialize()
    stats["after_exact_dedup"] = dedup_stats["after_exact"]
    stats["near_dup_losers"] = dedup_stats["near_dup_losers"]
    stats["dup_clusters"] = dedup_stats["clusters"]
    stats["surviving_docs"] = survivors.count()
    stats["surviving_tokens"] = int(survivors.sum("n_tokens") or 0)

    if cfg.mixture_weights is not None:
        from arlas_proc_ray.stages.sampling import (
            mixture_plan,
            mixture_sample,
        )

        plan = mixture_plan(
            survivors,
            domain_col=cfg.mixture_domain_col,
            weights=cfg.mixture_weights,
            size_col="n_tokens",
            budget=cfg.mixture_budget,
        )
        survivors = mixture_sample(
            survivors,
            domain_col=cfg.mixture_domain_col,
            key_col=cfg.id_col,
            weights=cfg.mixture_weights,
            plan=plan,
        ).materialize()
        stats["mixture_target_tokens"] = plan["total"]
        stats["mixture_docs"] = survivors.count()
        stats["mixture_tokens"] = int(survivors.sum("n_tokens") or 0)
    return survivors, stats
