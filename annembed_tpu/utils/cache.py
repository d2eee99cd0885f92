"""Host-keyed persistent JAX compilation cache.

The XLA:CPU backend stores AOT-compiled executables in the persistent
compilation cache keyed WITHOUT the host's CPU feature set.  When the
same cache directory is reused on a VM generation with different CPU
features (this fleet mixes amx-fp16-capable and plain-avx512 hosts),
every load emits a multi-KB ``cpu_aot_loader.cc`` error wall ("Machine
type used for XLA:CPU compilation doesn't match...") — the exact spam
that polluted MULTICHIP_r04.json's tail.  Keying the directory by a
fingerprint of the host CPU keeps each machine's cache private and the
load path silent.

The axon TPU backend compiles server-side, so the client-side cache
cannot cover those programs (documented in bench.py); setting it is
still free and covers any CPU-backend fallbacks.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """Short stable fingerprint of this host's CPU feature set."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def host_keyed_cache_dir(base: str) -> str:
    """``base`` extended with the host fingerprint; created if needed."""
    path = f"{base.rstrip('/')}-{host_fingerprint()}"
    os.makedirs(path, exist_ok=True)
    return path


def enable_persistent_cache(base: str = "/root/.cache/annembed_tpu/jax") -> str:
    """Point jax at a host-keyed persistent compilation cache.

    Safe to call before or after jax import, any number of times; a
    pre-existing explicit ``JAX_COMPILATION_CACHE_DIR`` wins.  Returns
    the directory in use.
    """
    explicit = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    path = explicit or host_keyed_cache_dir(base)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast-compiling programs: the axon tunnel's cost is
        # per-RPC, not per-FLOP
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:  # pragma: no cover - jax config names may drift
        pass
    return path
