"""_store_compact: the shared size-tiered policy + swap mechanism every
incremental store's compact() rides on — pure-python, no Spark."""

import os

import pytest
from hypothesis import given, settings, strategies as st

from graflo_spark.ops._store_compact import (
    dir_bytes, fold_plan, link_tree, swap_in, tiered_groups)


def test_tiered_groups_basics():
    # equal sizes fold together once min_run is met
    assert tiered_groups({0: 100, 1: 100, 2: 100, 3: 100}) == [[0, 1, 2, 3]]
    assert tiered_groups({0: 100, 1: 100, 2: 100}) == []
    assert tiered_groups({0: 100, 1: 101}, min_run=2) == [[0, 1]]
    # a genuinely bigger dir stays out of the small run
    assert tiered_groups(
        {0: 100_000, 1: 100, 2: 101, 3: 99, 4: 102}) == [[1, 2, 3, 4]]
    assert tiered_groups({}) == []
    with pytest.raises(ValueError, match="min_run"):
        tiered_groups({0: 1}, min_run=1)


def test_tiered_groups_near_equal_never_split():
    """The review finding the run-relative policy closes: near-equal dirs
    straddling an absolute 4^k boundary must still group (65536 = 4^8)."""
    sizes = {0: 65_530, 1: 65_550, 2: 65_531, 3: 65_529}
    assert tiered_groups(sizes) == [[0, 1, 2, 3]]


def test_tiered_groups_drift_capped_at_run_floor():
    # 100 anchors a run; 401 > 4*100 starts a new one — no cumulative creep
    assert tiered_groups(
        {0: 100, 1: 350, 2: 390, 3: 401, 4: 405}, min_run=2) == [
        [0, 1, 2], [3, 4]]


@given(st.dictionaries(st.integers(min_value=0, max_value=500),
                       st.integers(min_value=0, max_value=10**9),
                       max_size=60),
       st.integers(min_value=2, max_value=6))
@settings(max_examples=300, deadline=None)
def test_tiered_groups_properties(sizes, min_run):
    groups = tiered_groups(sizes, min_run=min_run)
    seen: set[int] = set()
    for g in groups:
        assert len(g) >= min_run
        assert g == sorted(g)
        assert not (set(g) & seen)              # groups are disjoint
        seen |= set(g)
        assert set(g) <= set(sizes)
        run = sorted(sizes[v] for v in g)
        assert run[-1] <= 4.0 * max(run[0], 1)   # drift capped at the floor
    # determinism
    assert tiered_groups(dict(reversed(list(sizes.items()))),
                         min_run=min_run) == groups


def test_fold_plan_full_and_tiered():
    sizes = {0: 10, 1: 10_000, 2: 11}
    assert fold_plan(sizes, full=True) == [[0, 1, 2]]
    assert fold_plan({0: 10}, full=True) == []
    assert fold_plan(sizes, min_run=2) == [[0, 2]]


def test_swap_in_success_and_rollback(tmp_path):
    root = tmp_path / "root"
    staging = tmp_path / "staging"
    old = tmp_path / ".old-x"
    root.mkdir(); (root / "a").write_text("old")
    staging.mkdir(); (staging / "b").write_text("new")
    swap_in(str(root), str(staging), str(old))
    assert (root / "b").exists() and not (root / "a").exists()
    assert not old.exists()                      # swept on success
    # rollback: staging vanished -> second rename fails -> root restored
    missing = tmp_path / "gone"
    with pytest.raises(OSError):
        swap_in(str(root), str(missing), str(tmp_path / ".old-y"))
    assert (root / "b").exists()
    assert not (tmp_path / ".old-y").exists()


def test_link_tree_hardlinks_and_dir_bytes(tmp_path):
    src = tmp_path / "src"
    src.mkdir(); (src / "f.parquet").write_bytes(b"x" * 128)
    (src / "sub").mkdir(); (src / "sub" / "g.parquet").write_bytes(b"y" * 64)
    dst = tmp_path / "dst"
    link_tree(str(src), str(dst))
    assert os.stat(dst / "f.parquet").st_ino == os.stat(
        src / "f.parquet").st_ino
    assert dir_bytes(str(src)) == 192 == dir_bytes(str(dst))
