"""Small utilities mirroring furnace/utils/pyt_utils.py's helpers."""

import os
from typing import List


def parse_devices(spec: str) -> List[int]:
    """'0-3' / '0,2,5' / '*' -> device index list
    (reference pyt_utils.py:82-106)."""
    import jax

    if spec.strip() == "*":
        return list(range(len(jax.devices())))
    out = []
    for part in spec.split(","):
        part = part.strip()
        if "-" in part:
            lo, hi = part.split("-")
            out.extend(range(int(lo), int(hi) + 1))
        elif part:
            out.append(int(part))
    return out


def ensure_dir(path: str):
    os.makedirs(path, exist_ok=True)


def link_file(src: str, link: str):
    """Replace ``link`` with a symlink to ``src``
    (reference pyt_utils.py:118-123, without the os.system shell-out)."""
    if os.path.lexists(link):
        os.remove(link)
    os.symlink(src, link)


def extant_file(path: str) -> str:
    """argparse type: the file must exist (pyt_utils.py:109-116)."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    return path


def enable_compile_cache(min_secs: int = 2):
    """Point XLA's persistent compile cache at the repo-local .jax_ccache/
    (shared by the test suite, the CLIs, and /bench.py — a cache warmed by
    any session run makes every later run's compiles ~free).

    Resolution order: $JAX_COMPILATION_CACHE_DIR (explicit override) >
    repo-local .jax_ccache (source checkouts only — pip installs must not
    litter site-packages) > ~/.cache/torchseg_tpu/jax_ccache; any OSError
    falls through to /tmp."""
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        if (os.path.exists(os.path.join(repo, "pyproject.toml"))
                or os.path.exists(os.path.join(repo, ".git"))):
            cache = os.path.join(repo, ".jax_ccache")
        else:
            cache = os.path.join(
                os.path.expanduser("~"), ".cache", "torchseg_tpu",
                "jax_ccache")
    try:
        os.makedirs(cache, exist_ok=True)
    except OSError:
        cache = "/tmp/jax_ccache"
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
    except Exception:
        pass
