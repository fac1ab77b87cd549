"""Tracing/profiling helpers (the reference's `trace` feature with Tracy,
ref: Cargo.toml:53-55, context.rs:155-157 — here via jax.profiler, whose
traces open in Perfetto / TensorBoard).

Usage:
    with trace_to("/tmp/rwkv-trace"):
        engine.infer(input)

or annotate custom regions:
    with span("prefill"):
        ...
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace_to(logdir: str, *, host_tracer_level: int = 2):
    """Capture a device+host profile into ``logdir`` (Perfetto-compatible)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profile written to %s", logdir)


@contextlib.contextmanager
def span(name: str):
    """Named host-side span, visible in profiles and timed in logs."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield
    log.debug("%s: %.3f ms", name, (time.perf_counter() - t0) * 1e3)


def annotate(name: str):
    """Decorator version of :func:`span`."""

    def deco(fn):
        def wrapped(*a, **kw):
            with span(name):
                return fn(*a, **kw)

        return wrapped

    return deco


def device_sync(tree):
    """Wait until a computation has REALLY executed by fetching a tiny
    slice of one of its outputs to the host.

    ``block_until_ready`` is the idiomatic sync, but some device
    transports (e.g. tunneled devices) acknowledge readiness before
    execution completes, which silently turns timing loops into
    dispatch-latency measurements. A data fetch cannot be acknowledged
    early; fetching a handful of elements keeps the transfer cost
    negligible on every backend. Use this in all timing code.
    """
    import numpy as np

    leaf = jax.tree.leaves(tree)[0]
    return np.asarray(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)
