"""Unit test for the BENCH.md run-history selection in
scripts/scaling.py (round-2 ADVICE #4): the "repeated runs" table must
filter to the current (replicas, sf_dir) configuration BEFORE slicing
to the most recent 6 — a raw [-6:] over a mixed-config history file
under-reports matching runs."""

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "scaling", pathlib.Path(__file__).parent.parent / "scripts" / "scaling.py"
)
_scaling = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_scaling)
recent_matching = _scaling.recent_matching


def _run(i, replicas=64, sf_dir="/root/testdata/sf0.1"):
    return {"replicas": replicas, "sf_dir": sf_dir, "i": i,
            "N": {"wall_secs": 600 + i}, "4N": {"wall_secs": 170 + i},
            "speedup": 3.4, "scaling_efficiency": 0.85}


def test_mixed_config_history_filters_before_slicing():
    # 8 matching runs interleaved with 10 runs at other configs; the
    # last 6 raw entries contain only 1 matching run, so a
    # slice-then-filter bug would return 1 row instead of 6.
    history = []
    for i in range(8):
        history.append(_run(i))
        history.append(_run(100 + i, replicas=8))
    history.append(_run(200, sf_dir="/root/testdata/sf0.01"))
    history.append(_run(201, replicas=16))

    out = recent_matching(history, 64, "/root/testdata/sf0.1")
    assert [h["i"] for h in out] == [2, 3, 4, 5, 6, 7]

    # other configurations select their own rows
    out8 = recent_matching(history, 8, "/root/testdata/sf0.1")
    assert [h["i"] for h in out8] == [102, 103, 104, 105, 106, 107]
    out16 = recent_matching(history, 16, "/root/testdata/sf0.1")
    assert [h["i"] for h in out16] == [201]


def test_history_shorter_than_k_returns_all():
    history = [_run(0), _run(1)]
    assert len(recent_matching(history, 64, "/root/testdata/sf0.1")) == 2
