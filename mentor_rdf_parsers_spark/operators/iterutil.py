"""Shared plumbing for driver-loop iterative operators (CC, transitive
closure, PageRank, forward chaining).

``fixed_plan`` scopes adaptive query execution OFF for the duration of
an iterative loop and restores the session setting afterwards;
``resolve_adaptive`` picks the mode automatically from the input size.
Whether AQE helps an iterative loop depends on the regime, and both
sides were measured with interleaved A/B on identical inputs:

* **Work-dominated rounds** (big input, partitions sized to the data):
  the round shape is fixed — one groupBy + one equi-join with stable
  cardinalities — so there is nothing for the re-planner to learn, and
  AQE's per-stage materialization barrier is serial driver latency
  repeated every round. Kiveris CC over 4M edges: 164 s vs 196 s at
  local[2], 56 s vs 95 s at local[8] (off vs on) — the gap WIDENS with
  cores, dropping 2→8 scaling efficiency from 0.73 to 0.52. AQE OFF.
* **Overhead-dominated rounds** (small input, many cores): each round
  shuffles kilobytes across ``spark.sql.shuffle.partitions`` tasks and
  per-task overhead dominates; AQE's partition coalescing is exactly
  the cure. Same CC on 5k edges at local[32]: 20–27 s with AQE off vs
  6.6–8.7 s with AQE on. AQE ON.

The dividing variable is rows per core. ``resolve_adaptive`` keeps the
session's AQE when the materialized input is below
``AUTO_FIXED_PLAN_ROWS_PER_CORE`` rows per core and disables it above —
both thresholds' regimes sit an order of magnitude to either side.
Skew is not an argument for AQE here: the star operations bound
neighborhood sizes by construction, and hub skew is handled explicitly
by salting (operators/materialize.py:with_salt).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

# ~50k rows/core: the measured AQE-off win sits at 500k rows/core and
# the measured AQE-on win at ~160 rows/core — an order of magnitude of
# slack on both sides of this line
AUTO_FIXED_PLAN_ROWS_PER_CORE = 50_000

_AQE_KEYS = ("spark.sql.adaptive.enabled",)


def resolve_adaptive(spark, adaptive_exec: Optional[bool], rows: int) -> bool:
    """Explicit caller choice wins; ``None`` = auto by rows/core over a
    MATERIALIZED input count (callers count a checkpointed DataFrame —
    plan statistics after joins/windows are guesses, a count is not)."""
    if adaptive_exec is not None:
        return adaptive_exec
    cores = max(spark.sparkContext.defaultParallelism, 1)
    return rows < AUTO_FIXED_PLAN_ROWS_PER_CORE * cores


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
