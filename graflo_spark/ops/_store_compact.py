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
designs): bucket the eligible batch dirs by ``floor(log_base(bytes))``
and fold only buckets holding at least ``min_run`` members, each into
the smallest batch id of its bucket. Small fresh batches fold into a
medium run; four medium runs fold into a large one; amortized rewrite is
O(N log N) bytes over the stream's life, and any single ``compact()``
call touches only the tiers that are actually ready — so compact walls
stay flat as the index grows (ingest walls already are).

Crash-safety is unchanged: callers keep their two-rename root-swap
protocol; this module only decides WHICH dirs fold and provides
``link_tree`` so the preserved dirs enter the staged root as hardlinks
(metadata-only on a POSIX fs — parquet files are immutable once
written) instead of byte copies. On object stores without hardlinks the
copy fallback applies; the fold I/O bound is what matters at scale.
"""

from __future__ import annotations

import math
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
    """Size-tiered fold plan: group eligible batch ids by the log-``base``
    bucket of their on-disk size; every bucket with >= ``min_run``
    members becomes one fold group (sorted ascending — the caller folds
    each group into its smallest id, keeping every surviving partition
    value committed-and-visible exactly when it was before). Buckets
    below the threshold are left alone — that is the whole point.
    """
    if min_run < 2:
        raise ValueError("min_run must be >= 2")
    buckets: dict[int, list[int]] = {}
    for v, s in sizes.items():
        tier = int(math.log(max(s, 1), base)) if s > 1 else 0
        buckets.setdefault(tier, []).append(v)
    return [sorted(vs) for _tier, vs in sorted(buckets.items())
            if len(vs) >= min_run]


def link_tree(src: str, dst: str) -> None:
    """``copytree`` with hardlinks where the fs allows (metadata-only;
    the immutable-parquet case), byte-copy fallback otherwise."""
    try:
        shutil.copytree(src, dst, copy_function=os.link)
    except OSError:
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(src, dst)
