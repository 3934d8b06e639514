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


# ----------------------------------------------------------------------
# per-op runtime report — the reference ``stat`` tool's per-layer duration
# table (furnace/tools/benchmark/model_hook.py:43-114, reporter.py:22-93)
# rebuilt on the XLA profiler: instead of monkey-patching module __call__,
# run the compiled program under a short trace and aggregate the xplane's
# per-op events.  Times are what the hardware actually executed (post-
# fusion), which the reference's python-side hooks can never see.
# ----------------------------------------------------------------------

def collect_op_times(fn, *args, runs: int = 3, logdir: str = None):
    """Run ``fn(*args)`` ``runs`` times under the XLA profiler.

    Returns ``(module_ms, ops)`` where ``module_ms`` is the average device
    time of the whole XLA module per run (None on backends that don't
    report it) and ``ops`` maps op name -> average ms per run.  Works on
    TPU (XLA Ops line) and on the CPU backend (thunk events), so tests and
    chip runs share one code path.
    """
    import glob
    import shutil
    import tempfile

    if logdir is None:
        logdir = tempfile.mkdtemp(prefix="op_times_")
    else:
        shutil.rmtree(logdir, ignore_errors=True)
    out = fn(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(logdir):
        for _ in range(runs):
            jax.block_until_ready(fn(*args))

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(logdir + "/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise RuntimeError(f"no xplane produced under {logdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    module_times = []
    ops = {}
    _noise = ("ThreadpoolListener", "ThunkExecutor", "end:")
    for plane in space.planes:
        names = {e.id: e.name for e in plane.event_metadata.values()}
        if "TPU" in plane.name:
            for line in plane.lines:
                if line.name == "XLA Modules":
                    module_times.extend(
                        ev.duration_ps / 1e9 for ev in line.events
                    )
                elif line.name == "XLA Ops":
                    for ev in line.events:
                        nm = names.get(ev.metadata_id, str(ev.metadata_id))
                        # skip control-flow wrappers (while/conditional):
                        # their body ops are listed individually, and the
                        # wrapper event double-counts them (observed: the
                        # train_speed 10-step chain's while reporting 40%
                        # of DFN's step on top of its children)
                        if nm.lstrip("%").startswith(
                                ("while", "conditional")):
                            continue
                        ops[nm] = ops.get(nm, 0.0) + ev.duration_ps / 1e9
        elif plane.name == "/host:CPU":
            for line in plane.lines:
                if not line.name.startswith("tf_XLAPjRt"):
                    continue
                for ev in line.events:
                    nm = names.get(ev.metadata_id, str(ev.metadata_id))
                    if any(nm.startswith(t) or t in nm for t in _noise):
                        continue
                    ops[nm] = ops.get(nm, 0.0) + ev.duration_ps / 1e9

    ops = {k: v / runs for k, v in ops.items()}
    module_ms = min(module_times) if module_times else None
    return module_ms, ops


def top_ops_table(ops: dict, n: int = 20) -> str:
    """Render the top-n ops by time as the reference reporter's table
    (duration + percentage columns, reporter.py:22-93)."""
    total = sum(ops.values()) or 1.0
    rows = sorted(ops.items(), key=lambda kv: -kv[1])[:n]
    width = max((len(nm) for nm, _ in rows), default=4)
    lines = [f"{'op':<{width}}  {'ms':>9}  {'%':>6}"]
    lines += [
        f"{nm:<{width}}  {t:9.3f}  {100 * t / total:6.2f}"
        for nm, t in rows
    ]
    lines.append(
        f"{'total (all ' + str(len(ops)) + ' ops)':<{width}}  "
        f"{total:9.3f}  {100.0:6.2f}"
    )
    return "\n".join(lines)


def print_op_report(fn, *args, runs: int = 3, n: int = 20):
    """One-call per-op runtime report; returns (module_ms, ops)."""
    module_ms, ops = collect_op_times(fn, *args, runs=runs)
    if module_ms is not None:
        print(f"device module time: {module_ms:.3f} ms/run")
    print(top_ops_table(ops, n))
    return module_ms, ops
