"""Tracing / profiling / memory accounting.

TPU-native counterparts of the reference's auxiliary tooling (SURVEY.md
§5.1): nvtx ranges -> ``jax.profiler.TraceAnnotation``; nsys / torch
profiler orchestration -> ``jax.profiler`` Perfetto traces; CUDA memory
accounting (``torch.cuda.memory_allocated`` static/dynamic/peak splits,
kernels/quantize_sdxl.py:337-456) -> device ``memory_stats``.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Callable, Dict, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(outdir: str):
    """Capture a profiler trace viewable in Perfetto/XProf
    (the nsys-profile flow of run_quantize_profile.sh)."""
    os.makedirs(outdir, exist_ok=True)
    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", outdir)


def annotate(name: str):
    """Named range inside a trace (the nvtx_decorator counterpart,
    kernels/quantize_sdxl.py:14-29)."""
    return jax.profiler.TraceAnnotation(name)


def annotate_fn(fn: Callable, name: Optional[str] = None) -> Callable:
    label = name or getattr(fn, "__name__", "fn")

    def wrapped(*a, **k):
        with jax.profiler.TraceAnnotation(label):
            return fn(*a, **k)

    return wrapped


def device_memory_stats(device=None) -> Dict[str, float]:
    """Current device memory accounting in MB. Keys mirror the
    reference's static(bytes in use)/peak split."""
    d = device or jax.local_devices()[0]
    stats = d.memory_stats() or {}
    mb = 1e6
    return {
        "bytes_in_use_mb": stats.get("bytes_in_use", 0) / mb,
        "peak_bytes_in_use_mb": stats.get("peak_bytes_in_use", 0) / mb,
        "bytes_limit_mb": stats.get("bytes_limit", 0) / mb,
    }


def measure_memory(fn: Callable, *args) -> Dict[str, float]:
    """Run ``fn`` and report static (pre-call) / dynamic (delta to peak) /
    peak memory, the reference's three-way split
    (kernels/quantize_sdxl.py:337-338,453-456)."""
    before = device_memory_stats()
    out = fn(*args)
    jax.block_until_ready(out)
    after = device_memory_stats()
    static = before["bytes_in_use_mb"]
    peak = after["peak_bytes_in_use_mb"]
    return {"static_mb": static, "dynamic_mb": max(peak - static, 0.0),
            "peak_mb": peak}


_FINGERPRINT_CACHE: Dict[int, float] = {}


def host_fingerprint(n: int = 8192, iters: int = 5,
                     refresh: bool = False) -> float:
    """Host-class fingerprint: ms for one n*n*n bf16 matmul (median of
    ``iters``), cached per process.

    The bench host migrates between machines whose TPU tunnel differs by
    10-50x in effective speed (DESIGN_NOTES: same binary 14us vs 2275us
    minutes apart); recording this fixed-size calibration number as a
    structured field in every bench artifact makes cross-round deltas
    attributable to code vs host (VERDICT r4 Weak #7)."""
    import statistics

    if not refresh and n in _FINGERPRINT_CACHE:
        return _FINGERPRINT_CACHE[n]
    import jax.numpy as jnp

    a = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda x: x @ x)
    jax.block_until_ready(f(a))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(f(a))
        ts.append((time.time() - t0) * 1000.0)
    ms = round(statistics.median(ts), 2)
    _FINGERPRINT_CACHE[n] = ms
    return ms


def timeit(fn: Callable, *args, iters: int = 20, warmup: int = 3,
           strict: bool = False) -> float:
    """Median-free mean ms/iter. ``strict`` blocks every iteration
    (device-roundtrip latency); default measures pipelined throughput."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    if strict:
        for _ in range(iters):
            jax.block_until_ready(fn(*args))
    else:
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0
