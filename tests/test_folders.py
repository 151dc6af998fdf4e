"""Folder-tree operators: children counts, BFS descendants, path prefix."""

from __future__ import annotations

from morphik_core_spark.operators import folders as fo

TREE = [
    # id, parent_id, full_path
    ("a", None, "/a"),
    ("a1", "a", "/a/1"),
    ("a2", "a", "/a/2"),
    ("a1x", "a1", "/a/1/x"),
    ("a1y", "a1", "/a/1/y"),
    ("a1xz", "a1x", "/a/1/x/z"),
    ("b", None, "/b"),
]


def _folders(spark):
    return spark.createDataFrame(TREE, "id string, parent_id string, full_path string")


def test_folder_children_counts(spark):
    out = {r.id: r.child_count for r in fo.folder_children(_folders(spark), "a").collect()}
    assert out == {"a1": 2, "a2": 0}


def test_folder_children_roots(spark):
    out = {r.id: r.child_count for r in fo.folder_children(_folders(spark), None).collect()}
    assert out == {"a": 2, "b": 0}


def test_descendants_bfs_depths(spark):
    rows = fo.folder_descendants(_folders(spark), ["a"]).collect()
    got = {(r.id, r.rel_depth) for r in rows}
    assert got == {("a1", 1), ("a2", 1), ("a1x", 2), ("a1y", 2), ("a1xz", 3)}
    assert all(r.root == "a" for r in rows)


def test_descendants_multiple_roots_and_leaf(spark):
    rows = fo.folder_descendants(_folders(spark), ["a1", "b"]).collect()
    got = {(r.root, r.id) for r in rows}
    assert got == {("a1", "a1x"), ("a1", "a1y"), ("a1", "a1xz")}  # b has no children


def test_descendants_cycle_guard_terminates(spark):
    cyc = spark.createDataFrame(
        [("p", "q", "/p"), ("q", "p", "/q")], "id string, parent_id string, full_path string"
    )
    rows = fo.folder_descendants(cyc, ["p"], max_depth=5).collect()
    # bounded: 5 levels of the p→q→p cycle, then stop
    assert len(rows) == 5


def test_descendants_collect_path_matches_distributed(spark):
    import pytest

    for roots in (["a"], ["a1", "b"], ["nope"]):
        dist = sorted(
            tuple(r) for r in fo.folder_descendants(_folders(spark), roots).collect()
        )
        fast = sorted(
            tuple(r)
            for r in fo.folder_descendants(
                _folders(spark), roots, collect_max_folders=1000
            ).collect()
        )
        assert fast == dist
    # cycle guard: identical bounded repetition, no visited set
    cyc = spark.createDataFrame(
        [("p", "q", "/p"), ("q", "p", "/q")], "id string, parent_id string, full_path string"
    )
    rows = fo.folder_descendants(cyc, ["p"], max_depth=5, collect_max_folders=10).collect()
    assert len(rows) == 5
    # the bound is a contract: larger dimensions must raise, not collect
    with pytest.raises(ValueError, match="collect_max_folders"):
        fo.folder_descendants(_folders(spark), ["a"], collect_max_folders=2)


def test_descendants_by_path_prefix_not_sibling(spark):
    got = {r.id for r in fo.descendants_by_path(_folders(spark), "/a/1").collect()}
    assert got == {"a1x", "a1y", "a1xz"}  # not /a/2, not /a itself


def test_folder_doc_counts(spark):
    docs = spark.createDataFrame(
        [(1, "/a/1"), (2, "/a/1"), (3, "/b"), (4, None), (5, "")],
        "doc_id long, folder_path string",
    )
    out = {r.id: r.doc_count for r in fo.folder_doc_counts(_folders(spark), docs).collect()}
    assert out["a1"] == 2 and out["b"] == 1 and out["a"] == 0
