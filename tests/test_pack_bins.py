"""Doc-boundary-preserving packing: pack_bins (quantile-bucket,
SQL-replayable) and pack_bins_ffd (histogram best-fit-decreasing,
Krell et al. 2021) — assignment invariants, determinism, the
histogram-bulk solve == item-by-item reference BFD, the FFD quality
bound, and packing_stats accounting."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from graflo_spark.ops.packing import (
    _bfd_histogram, pack_bins, pack_bins_ffd, packing_stats)
from graflo_spark.ops.textstats import token_count

CAP = 256


def _doc_lengths(tables):
    return tables["documents"].select(
        "doc_id", token_count(F.col("text")).alias("n_tok"))


def _check_invariants(assign, capacity, n_docs_expected):
    rows = assign.collect()
    # every packable doc assigned exactly once
    assert len(rows) == n_docs_expected
    assert len({r["id"] for r in rows}) == n_docs_expected
    fills: dict[int, int] = {}
    members: dict[int, int] = {}
    for r in rows:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
        members[r["bin_id"]] = members.get(r["bin_id"], 0) + 1
        if r["oversize"]:
            assert r["n_tokens"] > capacity
    for r in rows:
        if r["oversize"]:                      # oversize docs sit alone
            assert members[r["bin_id"]] == 1
        else:                                  # whole docs, never overflow
            assert fills[r["bin_id"]] <= capacity
    return fills


def test_pack_bins_invariants_and_grouping(spark, tables):
    d = _doc_lengths(tables)
    n = d.filter(F.col("n_tok") > 0).count()
    out = pack_bins(d, "doc_id", "n_tok", CAP,
                    boundaries=[25, 50, 75, 100])
    _check_invariants(out, CAP, n)
    # bucket ceilings hold: every doc's tokens <= its bucket's ceiling
    ceil_map = {0: 25, 1: 50, 2: 75, 3: 100, 4: CAP}
    for r in out.collect():
        assert r["n_tokens"] <= ceil_map[r["bucket"]]
    # bin id ranges are contiguous and disjoint across buckets
    by_bucket = {}
    for r in out.collect():
        by_bucket.setdefault(r["bucket"], set()).add(r["bin_id"])
    seen = set()
    for b in sorted(by_bucket):
        assert not (by_bucket[b] & seen)
        seen |= by_bucket[b]
    assert seen == set(range(len(seen)))


def test_pack_bins_quantile_boundaries_path(spark, tables):
    d = _doc_lengths(tables)
    n = d.filter(F.col("n_tok") > 0).count()
    out = pack_bins(d, "doc_id", "n_tok", CAP, n_buckets=6)
    _check_invariants(out, CAP, n)


def test_pack_bins_deterministic_across_partitioning(spark, tables):
    d = _doc_lengths(tables)
    a = sorted(map(tuple, pack_bins(
        d, "doc_id", "n_tok", CAP, boundaries=[25, 50, 75, 100]).collect()))
    b = sorted(map(tuple, pack_bins(
        d.repartition(17), "doc_id", "n_tok", CAP,
        boundaries=[25, 50, 75, 100]).collect()))
    assert a == b


def test_pack_bins_validation(spark, tables):
    d = _doc_lengths(tables)
    with pytest.raises(ValueError, match="capacity"):
        pack_bins(d, "doc_id", "n_tok", 0)
    with pytest.raises(ValueError, match="boundaries"):
        pack_bins(d, "doc_id", "n_tok", CAP, boundaries=[10, 300])
    with pytest.raises(ValueError, match="capacity"):
        packing_stats(d, -1)


def test_pack_bins_oversize_singletons(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 300), (3, 257), (4, 250), (5, 0)],
        "doc_id long, n_tok long")
    out = pack_bins(df, "doc_id", "n_tok", CAP, boundaries=[16, 128])
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}            # zero-token doc dropped
    assert rows[2]["oversize"] and rows[3]["oversize"]
    assert not rows[1]["oversize"] and not rows[4]["oversize"]
    assert len({rows[2]["bin_id"], rows[3]["bin_id"],
                rows[4]["bin_id"], rows[1]["bin_id"]}) == 4
    st_ = packing_stats(out, CAP).first()
    assert st_["n_docs"] == 4 and st_["n_bins"] == 4
    # oversize docs count capacity, whole docs their true length
    assert st_["packed_tokens"] == 10 + 256 + 256 + 250
    assert st_["efficiency"] == pytest.approx((10 + 256 + 256 + 250)
                                              / (4 * 256))


def _reference_bfd(lengths, capacity):
    """Item-by-item best-fit-decreasing with the same deterministic
    tie-break as _bfd_histogram (smallest remaining, then
    lexicographically smallest composition): the oracle the bulk
    histogram solve must reproduce exactly."""
    bins: list[list[int]] = []
    oversize = []
    for ln in sorted(lengths, reverse=True):
        if ln > capacity:
            oversize.append((ln,))
            continue
        cands = [
            (capacity - sum(b), tuple(sorted(b)), i)
            for i, b in enumerate(bins)
            if capacity - sum(b) >= ln
        ]
        if cands:
            _, _, i = min(cands)
            bins[i].append(ln)
        else:
            bins.append([ln])
    return sorted([tuple(sorted(b)) for b in bins] + oversize)


@given(st.lists(st.integers(min_value=1, max_value=40), min_size=1,
                max_size=120))
@settings(max_examples=200, deadline=None)
def test_bfd_histogram_matches_item_reference(lengths):
    cap = 32
    hist: dict[int, int] = {}
    for ln in lengths:
        hist[ln] = hist.get(ln, 0) + 1
    got = sorted(
        comp for comp, m in _bfd_histogram(list(hist.items()), cap)
        for _ in range(m))
    want = _reference_bfd(lengths, cap)
    # same multiset of bin compositions => same bin count, same fills
    assert got == want


@given(st.lists(st.integers(min_value=1, max_value=300), min_size=1,
                max_size=200))
@settings(max_examples=100, deadline=None)
def test_bfd_histogram_invariants(lengths):
    cap = 64
    hist: dict[int, int] = {}
    for ln in lengths:
        hist[ln] = hist.get(ln, 0) + 1
    strategies = _bfd_histogram(list(hist.items()), cap)
    placed: dict[int, int] = {}
    n_bins = n_oversize = 0
    for comp, m in strategies:
        assert m > 0
        n_bins += m
        if sum(comp) > cap:                     # only oversize singletons
            assert len(comp) == 1 and comp[0] > cap
            n_oversize += m
        else:
            assert sum(comp) <= cap             # whole bins never overflow
        for ln in comp:
            placed[ln] = placed.get(ln, 0) + m
    assert placed == hist                       # exact partition of items
    assert n_bins >= n_oversize


def test_pack_bins_ffd_on_documents(spark, tables):
    d = _doc_lengths(tables)
    n = d.filter(F.col("n_tok") > 0).count()
    out = pack_bins_ffd(d, "doc_id", "n_tok", CAP)
    fills = _check_invariants(out, CAP, n)
    # the distributed assignment realizes the histogram solve exactly
    lengths = [r["n_tok"] for r in d.filter(F.col("n_tok") > 0).collect()]
    want = _reference_bfd(lengths, CAP)
    got = sorted(
        tuple(sorted(r["n_tokens"] for r in grp))
        for grp in _group_by_bin(out.collect()))
    assert got == want
    # ... and packs at least as tight as the bucket scheme
    bucket = pack_bins(d, "doc_id", "n_tok", CAP,
                       boundaries=[25, 50, 75, 100])
    e_ffd = packing_stats(out, CAP).first()["efficiency"]
    e_bkt = packing_stats(bucket, CAP).first()["efficiency"]
    assert e_ffd >= e_bkt
    assert e_ffd > 0.9                          # BFD on 10-100 token docs
    assert len(fills) == len(want)


def _group_by_bin(rows):
    by_bin: dict[int, list] = {}
    for r in rows:
        by_bin.setdefault(r["bin_id"], []).append(r)
    return by_bin.values()


def test_pack_bins_ffd_deterministic_across_partitioning(spark, tables):
    d = _doc_lengths(tables)
    a = sorted(map(tuple, pack_bins_ffd(d, "doc_id", "n_tok", CAP).collect()))
    b = sorted(map(tuple, pack_bins_ffd(
        d.repartition(17), "doc_id", "n_tok", CAP).collect()))
    assert a == b
