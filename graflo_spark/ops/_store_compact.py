"""Shared size-tiered compaction policy for the incremental stores.

Every store in this repo (``retrieval.LexicalIndexStore``,
``dedup.LineDedupStore``, ``simsearch.IvfIndexStore``) accumulates one
``batch=<seq>`` parquet dir per ingested micro-batch and folds them with
``compact()``. The r10 measurement showed the fold-EVERYTHING policy's
cost growing monotonically with index size (compact walls 2.0 -> 3.6 s
over 4 folds): rewriting the full consolidated index every cadence is
Theta(N^2 / cadence) total I/O over a stream's life.

This module provides the LSM-style size-tiered alternative (the policy
behind Cassandra's STCS and Lucene's TieredMergePolicy, both public
designs): sort the eligible batch dirs by size, walk them into runs of
similar size (within ``base``x of each run's smallest member), and fold
only runs holding at least ``min_run`` members, each into the smallest
batch id of its run. Small fresh batches fold into a medium run; four
medium runs fold into a large one; amortized rewrite is O(N log N)
bytes over the stream's life, and any single ``compact()`` call touches
only the tiers that are actually ready — so compact walls stay flat as
the index grows (ingest walls already are).

Crash-safety is unchanged: callers keep their two-rename root-swap
protocol; this module only decides WHICH dirs fold and provides
``link_tree`` so the preserved dirs enter the staged root as hardlinks
(metadata-only on a POSIX fs — parquet files are immutable once
written) instead of byte copies. On object stores without hardlinks the
copy fallback applies; the fold I/O bound is what matters at scale.
"""

from __future__ import annotations

import os
import shutil


def dir_bytes(path: str) -> int:
    """Total bytes of regular files under ``path`` (recursive)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def tiered_groups(
    sizes: dict[int, int],
    min_run: int = 4,
    base: float = 4.0,
) -> list[list[int]]:
    """Size-tiered fold plan: sort the eligible batch dirs by (bytes, id)
    and walk them into RUNS of similar size — a run extends while the
    next dir is within ``base``x of the run's SMALLEST member; every run
    holding >= ``min_run`` members becomes one fold group (sorted
    ascending — the caller folds each group into its smallest id, keeping
    every surviving partition value committed-and-visible exactly when it
    was before). Runs below the threshold are left alone — that is the
    whole point.

    Run-relative grouping rather than absolute ``floor(log_base(bytes))``
    buckets (the first cut): two near-equal dirs straddling a ``base^k``
    boundary would land in different absolute buckets and make the fold
    nondeterministically no-op under byte jitter from compression or fs
    metadata (review finding); with runs anchored at each run's smallest
    member, equal-sized dirs always group, and drift within a run is
    still capped at ``base``x of its floor.
    """
    if min_run < 2:
        raise ValueError("min_run must be >= 2")
    ordered = sorted(sizes.items(), key=lambda kv: (kv[1], kv[0]))
    groups: list[list[int]] = []
    run: list[int] = []
    run_min = 0
    for v, s in ordered:
        if run and s > base * max(run_min, 1):
            if len(run) >= min_run:
                groups.append(sorted(run))
            run = []
        if not run:
            run_min = s
        run.append(v)
    if len(run) >= min_run:
        groups.append(sorted(run))
    return groups


def link_tree(src: str, dst: str) -> None:
    """``copytree`` with hardlinks where the fs allows (metadata-only;
    the immutable-parquet case), byte-copy fallback otherwise."""
    try:
        shutil.copytree(src, dst, copy_function=os.link)
    except OSError:
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(src, dst)


def fold_plan(
    sizes: dict[int, int],
    min_run: int = 4,
    full: bool = False,
) -> list[list[int]]:
    """The fold-group selection every store's ``compact()`` shares:
    ``full=True`` folds everything eligible into one group (>= 2 dirs or
    nothing), else the size-tiered :func:`tiered_groups` plan."""
    if full:
        return [sorted(sizes)] if len(sizes) >= 2 else []
    return tiered_groups(sizes, min_run=min_run)


def swap_in(root: str, staging: str, old: str) -> None:
    """The two-rename root swap every store's ``compact()`` shares:
    ``root`` -> ``old``, ``staging`` -> ``root``; a failure on the second
    rename rolls the first back (staging is left for the stale sweep), a
    process death between the renames leaves the full history under
    ``old`` for the store's restore path. On success the old root is
    swept. Committed data is never deleted before its replacement is
    fully in place."""
    os.rename(root, old)
    try:
        os.rename(staging, root)
    except OSError:
        os.rename(old, root)  # roll back; staging left for sweep
        raise
    shutil.rmtree(old, ignore_errors=True)
