"""Persistent XLA compile cache for the runnable entry points.

The reference has no analogue (torch eager pays no compile at boot); on
TPU, every cold jit of the SD3-medium forward costs 30-150s through the
remote compile helper, so a serving or training process that restarts
(preemption, rollout, config tweak) repays minutes of compile for code
that has not changed. One shared on-disk cache makes restart latency a
cache lookup instead.

Call `enable_compile_cache()` before the first jit dispatch. Safe to call
more than once; a backend that cannot serialize executables degrades to a
no-op.
"""

import functools
import hashlib
import logging
import os
import platform

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = "/tmp/tpdm_jax_cache_tpu"


@functools.lru_cache(maxsize=1)
def host_fingerprint() -> str:
    """Short hash identifying this host's compile-compatibility identity.

    JAX's persistent cache keys executables by program + compiler, NOT by
    the machine that compiled them; XLA:CPU AOT results built on a host
    with different vector features load with a SIGILL warning and can
    miscompute (observed: 2 numeric parity failures from a cache
    populated on an AMX-capable host, 2026-08-17). Worse, the cpuinfo
    flags alone do NOT discriminate AOT artifacts built under different
    XLA tuning flags (`+prefer-no-scatter/+prefer-no-gather` mismatch
    floods cpu_aot_loader.cc "machine feature mismatch … could lead to
    SIGILL" warnings from a cache populated by a foreign session,
    observed 2026-08-19). The fingerprint therefore hashes, in order:
    CPU ISA flags, jax + jaxlib versions, and the XLA tuning-flag
    identity ($XLA_FLAGS and $LIBTPU_INIT_ARGS). Keying the cache dir by
    all of it makes a foreign cache invisible instead of toxic.
    """
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats += " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:  # pragma: no cover - non-Linux
        feats += platform.processor()
    try:
        import jax
        import jaxlib

        feats += f"|jax={jax.__version__}|jaxlib={jaxlib.__version__}"
    except Exception:  # pragma: no cover - jax not importable
        pass
    # Tuning flags change the AOT machine-feature contract without
    # changing the program hash JAX keys on — fold them in. Sort the
    # space-separated XLA_FLAGS so a pure reordering isn't a cache miss.
    xla_flags = " ".join(sorted(os.environ.get("XLA_FLAGS", "").split()))
    feats += f"|xla_flags={xla_flags}"
    feats += f"|libtpu={os.environ.get('LIBTPU_INIT_ARGS', '')}"
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


def enable_compile_cache(path: str = None, min_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at `path` and return it.

    Resolution order: explicit arg > $TPDM_COMPILE_CACHE >
    $JAX_COMPILATION_CACHE_DIR (already honored by JAX itself — returned
    as-is) > DEFAULT_CACHE_DIR + per-host ISA fingerprint (see
    host_fingerprint). Explicit paths are suffixed with the fingerprint
    too unless they already contain it — a foreign-host cache must never
    be loadable by any spelling. `min_secs`: skip caching compiles
    cheaper than this (recompiling beats deserialize + hash-check).
    """
    import jax

    env_jax = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    resolved = path or os.environ.get("TPDM_COMPILE_CACHE") or env_jax \
        or f"{DEFAULT_CACHE_DIR}-{host_fingerprint()}"
    if host_fingerprint() not in resolved:
        resolved = f"{resolved}-{host_fingerprint()}"
    try:
        jax.config.update("jax_compilation_cache_dir", resolved)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_secs
        )
    except Exception:  # pragma: no cover - backend without serialization
        logger.warning("persistent compile cache unavailable", exc_info=True)
    return resolved
