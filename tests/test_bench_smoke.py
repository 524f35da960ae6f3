"""bench.py must always run unattended (the driver records its one JSON
line at round close). Smoke the measurement path — bf16 and int8 — on the
CPU-sized demo config so wiring regressions surface in CI, not in the
round-end TPU run."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402 — repo-root module, not in the package


@pytest.mark.slow
def test_measure_smoke_bf16_and_int8():
    cfg = os.path.join(os.path.dirname(bench.__file__),
                       "configs", "demo", "pillarnet18_demo.py")
    for int8 in (False, True):
        m = bench._measure(cfg, n_frames=3, int8=int8,
                           big_batch=8 if int8 else 0,
                           mem_ledger=not int8)
        assert m["real_p50"] > 0
        assert m["pipelined"] > 0
        assert m["bs4"] > 0
        assert m["pipelined_bs4"] > 0
        assert m["dispatch_floor"] >= 0
        if int8:
            assert m["pipelined_bs8"] > 0
        else:
            # structured memory ledger: the graph-analysis fallback must
            # produce a real number even without runtime memory_stats
            assert m["peak_hbm_bytes"] and m["peak_hbm_bytes"] > 0


@pytest.mark.slow
def test_measure_smoke_two_stage():
    """The two-stage branch of _measure (post_process instead of predict)
    must run unattended — covers the bench's pillarrcnn entry wiring."""
    cfg = os.path.join(os.path.dirname(bench.__file__),
                       "configs", "demo", "pillarrcnn18_demo.py")
    for int8 in (False, True):
        m = bench._measure(cfg, n_frames=3, int8=int8)
        assert m["real_p50"] > 0
        assert m["pipelined"] > 0
        assert m["pipelined_bs4"] > 0
