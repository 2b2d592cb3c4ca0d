"""Round-12 memo-governance ledger (formula_1_spark.queries.memo).

Pure-Python tests over the cross-family LRU ledger — no SparkSession
needed: the ledger's storage actions on non-DataFrame entries are
reference drops, which is exactly what these tests exercise.
"""

from __future__ import annotations

import formula_1_spark.queries.memo as memo


def _key(app: str, path: str, extra: tuple = ()) -> tuple:
    return (app, path, 1, 100, *extra)


def setup_function(_fn) -> None:
    memo._LEDGER.clear()


def test_install_get_roundtrip():
    reg: dict = {}
    k = _key("app1", "/d/documents.parquet")
    memo.install(reg, k, {"tok": "T"})
    assert memo.get(reg, k) == {"tok": "T"}
    assert memo.get(reg, None) is None


def test_none_key_builds_uncached():
    reg: dict = {}
    out = memo.install(reg, None, "fresh")
    assert out == "fresh" and reg == {} and not memo._LEDGER


def test_superseded_same_path_evicted():
    reg: dict = {}
    k1 = ("app1", "/d/documents.parquet", 1, 100)
    k2 = ("app1", "/d/documents.parquet", 2, 100)  # regenerated file
    memo.install(reg, k1, "old")
    memo.install(reg, k2, "new")
    assert list(reg) == [k2]
    assert memo.get(reg, k1) is None


def test_dead_app_entries_dropped_across_registries():
    reg_a: dict = {}
    reg_b: dict = {}
    memo.install(reg_a, ("dead", "/d/a.parquet", 1, 1), "stale")
    memo.install(reg_b, ("app1", "/d/b.parquet", 1, 1), "live")
    assert reg_a == {}  # dead-app entry purged from the OTHER registry too
    assert len(memo._LEDGER) == 1


def test_budget_evicts_lru_first(monkeypatch):
    monkeypatch.setattr(memo, "MEMO_MAX_RELATIONS", 3)
    reg: dict = {}
    k1 = _key("app1", "/d/one.parquet")
    k2 = _key("app1", "/d/two.parquet")
    k3 = _key("app1", "/d/three.parquet")
    memo.install(reg, k1, {"a": 1, "b": 2})  # 2 rels
    memo.install(reg, k2, "x")  # 3 rels total — at budget
    memo.get(reg, k1)  # touch k1 so k2 is now LRU
    memo.install(reg, k3, {"c": 1})  # 4 rels — one over budget
    assert k3 in reg  # freshly installed entry is protected
    assert k2 not in reg  # LRU victim evicted first
    assert k1 in reg  # recently touched survives (2 + 1 = 3 <= budget)


def test_budget_never_evicts_the_fresh_entry(monkeypatch):
    monkeypatch.setattr(memo, "MEMO_MAX_RELATIONS", 1)
    reg: dict = {}
    k = _key("app1", "/d/big.parquet")
    memo.install(reg, k, {"a": 1, "b": 2, "c": 3})  # 3 rels > budget of 1
    assert k in reg  # protected even though over budget


def test_lazily_extended_entries_recounted_live(monkeypatch):
    monkeypatch.setattr(memo, "MEMO_MAX_RELATIONS", 4)
    reg: dict = {}
    k1 = _key("app1", "/d/fam.parquet")
    ent = {"tok": 1, "sh": 2}
    memo.install(reg, k1, ent)
    ent["grams13"] = 3  # lazy family extension (the dedup pattern)
    reg2: dict = {}
    memo.install(reg2, _key("app1", "/d/other.parquet"), {"x": 1, "y": 2})
    # 3 (recounted) + 2 = 5 > 4 — the LRU (k1) family must have been evicted
    assert k1 not in reg


def test_file_key_extra_components(tmp_path):
    # file_key needs a real file; use tmp_path
    p = tmp_path / "embeddings.parquet"
    p.write_bytes(b"x")

    class _Ctx:
        applicationId = "app1"

    class _Spark:
        sparkContext = _Ctx()

    k64 = memo.file_key(_Spark(), str(tmp_path), "embeddings", extra=(64,))
    k32 = memo.file_key(_Spark(), str(tmp_path), "embeddings", extra=(32,))
    assert k64 is not None and k32 is not None and k64 != k32
    assert memo.file_key(_Spark(), str(tmp_path), "missing") is None
