"""Wall-clock-bounded long-run soak in CI (the full 100k-frame run is
benchmarks/soak.py; this bounded version must still cover thousands of
frames of phase/AGC recurrence on the CPU harness)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bounded_soak():
    from benchmarks.soak import run_soak
    summary = run_soak(total_frames=200_000, budget_s=45.0, chunk=1000,
                       size=64, log=lambda s: None)
    assert summary["ok"]
    # The CPU harness does >100 fps at 64x64; a 45 s budget must clear
    # several thousand frames (minutes of synthesized audio).
    assert summary["frames"] >= 3000, summary
    assert summary["agc_envelope_max"] < 1e3
