"""bench.py robustness: the driver record must survive one transient
TPU-tunnel failure (VERDICT r03 item 3 — the round's official number was
zeroed by a single "remote_compile: read body: response body closed").
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class _TunnelError(RuntimeError):
    pass


def test_retries_injected_transient_failure():
    """One injected tunnel failure, then success — the exact r03 scenario."""
    calls = []

    def build_and_run():
        calls.append(1)
        if len(calls) == 1:
            raise _TunnelError(
                "INTERNAL: remote_compile: read body: response body closed")
        return 42.0

    out = bench.retry_transient(build_and_run, attempts=3, _sleep=lambda s: None)
    assert out == 42.0
    assert len(calls) == 2


def test_rebuilds_each_attempt():
    """Every retry re-invokes the BUILD thunk (fresh jit wrapper), not a
    cached handle."""
    built = []

    def build_and_run():
        token = object()
        built.append(token)
        if len(built) < 3:
            raise _TunnelError("UNAVAILABLE: Socket closed")
        return token

    out = bench.retry_transient(build_and_run, attempts=3, _sleep=lambda s: None)
    assert out is built[-1] and len(built) == 3


def test_non_transient_propagates_immediately():
    calls = []

    def build_and_run():
        calls.append(1)
        raise ValueError("Mosaic lowering failed: bad layout")

    with pytest.raises(ValueError):
        bench.retry_transient(build_and_run, attempts=3, _sleep=lambda s: None)
    assert len(calls) == 1


def test_exhausted_retries_propagate():
    def build_and_run():
        raise _TunnelError("DEADLINE_EXCEEDED: tunnel")

    with pytest.raises(_TunnelError):
        bench.retry_transient(build_and_run, attempts=2, _sleep=lambda s: None)


def test_transient_classifier():
    assert bench.is_transient_error(
        RuntimeError("INTERNAL: remote_compile: read body: "
                     "response body closed"))
    assert bench.is_transient_error(RuntimeError("UNAVAILABLE: tunnel"))
    assert not bench.is_transient_error(ValueError("shape mismatch"))
    assert not bench.is_transient_error(
        RuntimeError("Mosaic failed to lower"))


def test_pallas_smoke_runs_on_cpu():
    """The smoke kernel itself must pass on the CPU interpreter."""
    bench.pallas_smoke()
