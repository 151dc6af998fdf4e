from __future__ import annotations

import pytest

from morphik_core_spark.operators.scopes import (
    AuthContext,
    access_predicate,
    build_folder_scope,
    status_predicate,
    system_predicate,
)

ROWS = [
    # (id, owner_id, app_id, folder_name, folder_path, end_user_id, status)
    ("d1", "u1", "app1", "q3", "/corp/finance/q3", "eu1", "completed"),
    ("d2", "u1", "app1", "reports", "/corp/finance/q3/reports", None, "processing"),
    ("d3", "u2", "app2", "hr", "/corp/hr", "eu2", "completed"),
    ("d4", "u2", "app2", None, None, "", "failed"),
    ("d5", "u1", "app1", "", "", "eu1", None),
    ("d6", "u3", "app1", "deep", "/corp/finance/q3/reports/raw", "eu1", "completed"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS,
        "external_id string, owner_id string, app_id string, folder_name string, "
        "folder_path string, end_user_id string, status string",
    ).cache()


def ids(df, pred):
    return {r.external_id for r in df.filter(pred).select("external_id").collect()}


def test_access_app_vs_owner(docs):
    assert ids(docs, access_predicate(AuthContext(app_id="app1"))) == {"d1", "d2", "d5", "d6"}
    assert ids(docs, access_predicate(AuthContext(user_id="u2"))) == {"d3", "d4"}


def test_system_null_matches_empty_string(docs):
    # legacy back-compat: NULL filter on folder_name matches NULL and ''
    assert ids(docs, system_predicate({"folder_name": None})) == {"d4", "d5"}
    assert ids(docs, system_predicate({"end_user_id": [None, "eu2"]})) == {"d2", "d3", "d4"}


def test_folder_path_prefix(docs):
    got = ids(docs, system_predicate({"folder_path_prefix": "/corp/finance/q3"}))
    assert got == {"d1", "d2", "d6"}
    # exact-only via plain folder_path
    assert ids(docs, system_predicate({"folder_path": "/corp/finance/q3"})) == {"d1"}


def test_folder_path_prefix_depth(docs):
    scope = build_folder_scope(folder_path="/corp/finance/q3", folder_depth=1)
    assert ids(docs, system_predicate(scope)) == {"d1", "d2"}
    scope_all = build_folder_scope(folder_path="/corp/finance/q3", folder_depth=-1)
    assert ids(docs, system_predicate(scope_all)) == {"d1", "d2", "d6"}
    scope_exact = build_folder_scope(folder_path="/corp/finance/q3", folder_depth=0)
    assert ids(docs, system_predicate(scope_exact)) == {"d1"}


def test_status_filter(docs):
    assert ids(docs, status_predicate(["completed"])) == {"d1", "d3", "d6"}
    assert ids(docs, status_predicate(["failed", None])) == {"d4", "d5"}
    assert ids(docs, status_predicate(None)) == {r[0] for r in ROWS}


def test_combined_scope(docs):
    pred = (
        access_predicate(AuthContext(app_id="app1"))
        & system_predicate({"folder_path_prefix": "/corp/finance/q3"})
        & status_predicate(["completed"])
    )
    assert ids(docs, pred) == {"d1", "d6"}
