"""Profiling / tracing — the TPU counterpart of torchprof + the reference's
ModelHook timing layer (furnace/tools/benchmark/compute_speed.py:42-44,
model_hook.py:43-114).

On TPU the per-op timeline comes from the XLA profiler, not python hooks:
``trace(logdir)`` captures a TensorBoard-viewable trace (xplane) of every
compiled op, and ``annotate`` adds named regions.  Pair with tools/stats.py
for FLOPs/params.
"""

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace('/tmp/tb'): run_step()` then
    inspect in TensorBoard's profile plugin."""
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Named region inside a trace (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)


def start_server(port: int = 9012):
    """Live-attach profiling server (jax.profiler.start_server)."""
    return jax.profiler.start_server(port)


def device_memory_profile(path: str):
    """Dump a pprof-format device memory profile."""
    with open(path, "wb") as f:
        f.write(jax.profiler.device_memory_profile())
