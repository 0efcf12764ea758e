"""Suite-hygiene pins: the skip budget (r4 verdict #8).

A skipped test is invisible in a green run; this file makes every skip
gate explicit and re-evaluates each gate's LIVE condition, so a
silently-broken test cannot hide among accreting skips and an
environment change (protobuf appearing, a fixture vanishing) flips a
visible assertion instead of silently changing coverage.
"""

import importlib.util
import os
import pathlib
import re


def _has_module(name: str) -> bool:
    try:
        return importlib.util.find_spec(name) is not None
    except ModuleNotFoundError:
        return False


def test_suite_skip_budget():
    """Exactly ONE test may skip in this container: the
    transformWithStateInPandas execution pin (Spark 4's state-server
    protocol imports google.protobuf, which this container doesn't ship
    and pip is unavailable).  The other two gates (reference PBF
    fixture, DuckDB JDBC jar) must be LIVE here — if either starts
    skipping, coverage silently shrank and this pin says so."""
    # gate 1: the budgeted skip — protobuf absent in this container
    assert not _has_module("google.protobuf"), (
        "google.protobuf appeared: remove the skip budget and run "
        "test_capped_balance_stream_matches_batch unconditionally"
    )
    # gates 2+3: must not skip
    assert os.path.exists("/root/reference/test/data/osmdata.osm.pbf"), (
        "PBF datasource tests would silently skip"
    )
    from test_jdbc_live import _find_jar

    assert _find_jar() is not None, "JDBC live tests would silently skip"


def test_skip_gates_are_enumerated():
    """Every skip construct in the test tree must be one of the known,
    individually-justified gates — adding a new skip requires updating
    this list (and the budget above) consciously."""
    root = pathlib.Path(__file__).parent
    pat = re.compile(r"pytest\.importorskip|mark\.skipif|pytest\.skip\(")
    found = {}
    for p in sorted(root.glob("*.py")):
        if p.name == "test_meta.py":
            continue
        n = len(pat.findall(p.read_text()))
        if n:
            found[p.name] = n
    assert found == {
        "test_pbf_datasource.py": 1,  # reference PBF fixture gate
        "test_streaming.py": 1,  # google.protobuf gate (the 1 budgeted skip)
        "test_jdbc_live.py": 2,  # DuckDB JDBC jar gate (2 test classes)
    }, found
