"""Shared plumbing for driver-loop iterative operators (CC, transitive
closure, PageRank, forward chaining).

``fixed_plan`` scopes adaptive query execution OFF for the duration of
an iterative loop and restores the session setting afterwards. AQE
re-plans every query stage at runtime, which is the right default for
one-shot analytics — but an iterative operator re-executes the SAME
fixed-shape round (one groupBy + one equi-join, cardinalities known
and stable) tens of times, so there is nothing for the re-planner to
learn, and its per-stage materialization barrier is pure serial driver
latency that repeats every round and does not shrink with executors.

Measured on the shuffle-scaling harness (scripts/
shuffle_scaling_bench.py, interleaved A/B on identical input): Kiveris
CC over 4M edges ran 164 s vs 196 s at local[2] and 56 s vs 95 s at
local[8] (AQE off vs on) — the gap WIDENS with cores because the
re-plan latency is serial, dropping 2→8 scaling efficiency from 0.73
to 0.52. Skew is not an argument for AQE here: the star operations
bound neighborhood sizes by construction, and hub skew is handled
explicitly by salting (operators/materialize.py:with_salt).
"""

from __future__ import annotations

from contextlib import contextmanager

_AQE_KEYS = ("spark.sql.adaptive.enabled",)


@contextmanager
def fixed_plan(spark, adaptive_exec: bool = False):
    """Disable AQE inside an iterative fixed-shape loop (no-op when
    ``adaptive_exec=True`` — the caller's escape hatch to keep the
    session behavior)."""
    if adaptive_exec:
        yield
        return
    old = {}
    for k in _AQE_KEYS:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, "false")
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
