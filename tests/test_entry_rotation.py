"""The driver-verified rotation (__spark_entry__._driver_verified) is the
gate that decides which queries re-enter the driver's 50-entry
verification window. Round 3 shipped broken because this logic treated
"verified once" as "verified forever"; these tests pin the staleness
rules that replaced it. No Spark needed — pure file-state logic."""

import json
import sys

sys.path.insert(0, "/root/repo")

from __spark_entry__ import _driver_verified


def _write(tmp_path, name, obj):
    with open(tmp_path / name, "w") as f:
        json.dump(obj, f)


GREEN = {"hash_match": True}
ERR = {"err": "AnalysisException", "hash_match": False}


def test_green_row_verifies(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"q1": GREEN, "q2": ERR})
    assert _driver_verified(str(tmp_path)) == {"q1"}


def test_later_round_error_overrides_earlier_green(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"q1": GREEN})
    _write(tmp_path, "CORRECTNESS_r02.json", {"q1": ERR})
    assert _driver_verified(str(tmp_path)) == set()


def test_later_round_green_recovers(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"q1": ERR})
    _write(tmp_path, "CORRECTNESS_r02.json", {"q1": GREEN})
    assert _driver_verified(str(tmp_path)) == {"q1"}


def test_parity_fail_drops_even_with_green_history(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {"q1": GREEN, "q2": GREEN})
    _write(tmp_path, "PARITY_LAST.json", {"results": {"q1": "fail"}})
    assert _driver_verified(str(tmp_path)) == {"q2"}


def test_sticky_fail_round_needs_newer_certification(tmp_path):
    """A parity failure observed while round N was latest invalidates
    every green up to round N — the round-3 silent-break scenario: green
    in r02, broken (and locally fixed) during r03, must re-certify."""
    _write(tmp_path, "CORRECTNESS_r02.json", {"q1": GREEN})
    _write(tmp_path, "CORRECTNESS_r03.json", {"other": GREEN})
    _write(
        tmp_path,
        "PARITY_LAST.json",
        {"results": {"q1": "pass"}, "last_fail_round": {"q1": 3}},
    )
    assert "q1" not in _driver_verified(str(tmp_path))
    # ...and a NEWER driver green clears the sticky failure
    _write(tmp_path, "CORRECTNESS_r04.json", {"q1": GREEN})
    assert "q1" in _driver_verified(str(tmp_path))


def test_unreadable_state_degrades_to_verify_everything(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    assert _driver_verified(str(tmp_path)) == set()
