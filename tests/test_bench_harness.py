"""Unit tests for the bench.py harness helpers (no device work).

The bench harness is driver-gated evidence (BENCH_r*.json); its retry and
steady-timing behavior is load-bearing enough to lock with tests:
a transient axon remote-compile flake silently deleted a whole row from
one r5 session's JSON before ``tunnel_retry`` existed.
"""
import time

import numpy as np
import pytest

import bench


class TestTunnelRetry:
    def test_passes_through_result(self):
        assert bench.tunnel_retry(lambda: 42) == 42

    def test_retries_transient_then_succeeds(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError(
                    "INTERNAL: http://127.0.0.1:8103/remote_compile: read "
                    "body: response body closed before all bytes were read"
                )
            return "ok"

        assert bench.tunnel_retry(flaky, attempts=3, wait_s=0) == "ok"
        assert calls["n"] == 3

    def test_exhausted_transient_reraises(self):
        def always_flaky():
            raise RuntimeError("remote_compile: read body: closed")

        with pytest.raises(RuntimeError, match="remote_compile"):
            bench.tunnel_retry(always_flaky, attempts=2, wait_s=0)

    def test_non_transient_raises_immediately(self):
        calls = {"n": 0}

        def broken():
            calls["n"] += 1
            raise ValueError("shape mismatch (a real bug, not the tunnel)")

        with pytest.raises(ValueError):
            bench.tunnel_retry(broken, attempts=3, wait_s=0)
        assert calls["n"] == 1


class TestSteadyTime:
    def test_scales_repeats_to_target_block(self):
        per, block, reps = bench.steady_time(
            lambda: time.sleep(0.01), target_s=0.1, max_repeats=64
        )
        assert reps >= 2
        assert block >= 0.1
        assert per == pytest.approx(block / reps)

    def test_long_call_uses_median_of_three(self):
        per, block, reps = bench.steady_time(
            lambda: time.sleep(0.05), target_s=0.01
        )
        assert reps == 1
        assert per == block
        assert per >= 0.05


class TestChipProbeConstants:
    def test_probe_reference_positive(self):
        assert bench.PROBE_REF_TFLOPS > 0

    def test_median_time_is_median(self):
        durations = iter([0.0, 0.0, 0.0])
        t = bench.median_time(lambda: next(durations, None), repeats=3)
        assert t >= 0.0
        assert np.isfinite(t)
