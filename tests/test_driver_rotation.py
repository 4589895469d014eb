"""Driver-window rotation: the tiers are DERIVED from the committed
CORRECTNESS_r*.json ledgers (never hand-edited again — the hand-edited sets
went stale twice, rounds 8 and 10). Pins the ordering contract against a
synthetic ledger and sanity-checks the real repo ledger."""

import importlib.util
import json
import os

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "__spark_entry__.py")


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_driver_order_synthetic_ledger():
    entry = _load_entry()
    names = ["q01", "q02", "q03", "q04", "q05", "q06"]
    # q03 never verified; q01/q05 green in r2; q02 green r1 then r3;
    # q04 green r1; q06 red-only (never green → pending).
    ledger = {"q01": 2, "q05": 2, "q02": 3, "q04": 1}
    order = entry._driver_order(names, ledger)
    # pending first (registration order), then ascending latest-green round,
    # registration order within each tier.
    assert order == ["q03", "q06", "q04", "q01", "q05", "q02"]


def test_driver_order_reverify_front():
    entry = _load_entry()
    names = ["q01", "q02", "q03"]
    ledger = {"q01": 1, "q02": 9}
    # q02 rewritten in round 10, latest green r9 → pinned to the front
    entry._REVERIFY_FRONT = {"q02": 10}
    order = entry._driver_order(names, ledger)
    assert order == ["q03", "q02", "q01"]
    # SELF-CLEARING: once the ledger records a green at/past the rewrite
    # round, the entry is inert — a forgotten stale entry can never re-pin
    # a freshly verified query to the window front (the round-8/-10
    # hand-maintenance failure mode, closed for good).
    order = entry._driver_order(names, {"q01": 1, "q02": 10})
    assert order == ["q03", "q01", "q02"]


def test_load_ledger_semantics(tmp_path):
    entry = _load_entry()
    # r1: q01 hash-green, q02 red, q03 rows-only green (hash_match None).
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "q01": {"rows_match": True, "schema_match": True, "hash_match": True},
        "q02": {"rows_match": False, "schema_match": True, "hash_match": False},
        "q03": {"rows_match": True, "schema_match": True, "hash_match": None},
    }))
    # r2: q02 goes green; q01 has a later red — must NOT erase the r1 green.
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "q01": {"rows_match": None, "schema_match": None, "hash_match": None,
                "err": "transient"},
        "q02": {"rows_match": True, "schema_match": True, "hash_match": True},
    }))
    ledger = entry._load_ledger(str(tmp_path))
    assert ledger == {"q01": 1, "q03": 1, "q02": 2}


def test_real_ledger_drives_the_window():
    """On the actual repo ledger, the first-50 window must hold the stalest
    EFFECTIVE verdicts: no name in the window may be fresher than a name
    outside it, where a post-green rewrite recorded in _REVERIFY_FRONT
    legitimately re-stales its query (q156 in round 14)."""
    entry = _load_entry()
    from ocr_vector_db_spark.plans.inventory import QUERIES

    ledger = entry._load_ledger(os.path.dirname(_ENTRY))
    order = entry._driver_order(list(QUERIES), ledger)
    assert sorted(order) == sorted(QUERIES)

    def eff(n):
        if n not in ledger:
            return -2
        if ledger[n] < entry._REVERIFY_FRONT.get(n, 0):
            return -1  # rewritten after its latest green: re-stale
        return ledger[n]

    window, rest = order[:50], order[50:]
    max_in = max(eff(n) for n in window)
    min_out = min(eff(n) for n in rest) if rest else max_in
    assert max_in <= min_out
