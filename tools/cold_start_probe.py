"""Cold-start investigation probe (VERDICT r3 item 8).

The bench's cold pass is ~200-320 s of serial remote compiles; the
fresh-process user experience is the one axis where the reference (11 s
from process start) still wins.  Two hypotheses to settle on-chip:

  H1. The persistent compilation cache never covers axon compiles
      (round-3 note).  Verify by compiling with the cache forced wide
      open (min size/time = 0) and checking the dir + jax's own debug
      log for the unsupported-serialization warning.

  H2. Remote compiles can PARALLELIZE: if the server compiles
      concurrently and the client RPC releases the GIL, pre-compiling
      the pipeline's programs on a thread pool cuts the cold wall from
      sum(compile_i) to ~max(compile_i).  Measure by compiling K
      distinct dense-segment variants serially, then K other variants
      on a thread pool, same process.

Usage (one process, owns the chip):  python tools/cold_start_probe.py
"""
import json
import logging
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = "/tmp/jax_cache_probe"
os.environ["JAX_COMPILATION_CACHE_DIR"] = CACHE_DIR

T0 = time.monotonic()


def note(m):
    print(f"[{time.monotonic()-T0:7.1f}s] {m}", flush=True)


def emit(row):
    print("JSON " + json.dumps(row), flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# force the cache wide open + surface its decisions
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
logging.basicConfig(stream=sys.stderr, level=logging.WARNING)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

note(f"devices {jax.devices()}")


def make_program(n: int, k: int):
    """A compile-heavy program shaped like one optimize segment:
    distinct (n, k) => distinct cache key."""

    @jax.jit
    def seg(y, idx, w):
        def body(y, i):
            yj = y[:, idx]                       # (2, k, n)
            d2 = jnp.sum(jnp.square(yj - y[:, None, :]), 0)
            coeff = w / (1.0 + d2)
            y = y + jnp.sum((yj - y[:, None, :]) * coeff[None], axis=1)
            y = y + 0.001 * jnp.roll(y, i, axis=1)
            return y, None

        y, _ = jax.lax.scan(body, y, jnp.arange(8))
        return y

    y = jnp.zeros((2, n), jnp.float32)
    idx = jnp.zeros((k, n), jnp.int32)
    w = jnp.zeros((k, n), jnp.float32)
    return seg, (y, idx, w)


def compile_one(args):
    fn, a = args
    t0 = time.perf_counter()
    fn.lower(*a).compile()
    return time.perf_counter() - t0


# ---- H2: serial vs threaded compiles -----------------------------------
SER_SHAPES = [(70_000 + i, 3) for i in range(4)]
PAR_SHAPES = [(70_000 + i, 4) for i in range(4)]

progs = [make_program(*s) for s in SER_SHAPES]
t0 = time.perf_counter()
ser_times = [compile_one(p) for p in progs]
serial_wall = time.perf_counter() - t0
note(f"serial compiles: {['%.1f' % t for t in ser_times]} "
     f"wall {serial_wall:.1f}s")

progs2 = [make_program(*s) for s in PAR_SHAPES]
t0 = time.perf_counter()
with ThreadPoolExecutor(4) as ex:
    par_times = list(ex.map(compile_one, progs2))
par_wall = time.perf_counter() - t0
note(f"threaded compiles: {['%.1f' % t for t in par_times]} "
     f"wall {par_wall:.1f}s")
emit({"bench": "parallel_compile", "serial_wall_s": round(serial_wall, 1),
      "threaded_wall_s": round(par_wall, 1),
      "speedup": round(serial_wall / max(par_wall, 1e-9), 2),
      "serial_each_s": [round(t, 1) for t in ser_times],
      "threaded_each_s": [round(t, 1) for t in par_times]})

# ---- H1: does the persistent cache cover these compiles? ----------------
entries = os.listdir(CACHE_DIR) if os.path.isdir(CACHE_DIR) else []
note(f"cache dir {CACHE_DIR}: {len(entries)} entries")
emit({"bench": "compile_cache", "dir_exists": os.path.isdir(CACHE_DIR),
      "n_entries": len(entries)})

# if entries exist, a THIRD distinct shape compiled now vs after a
# process restart would prove reload; in-process we can at least check
# a recompile of an existing shape is instant (in-memory cache)
fn, a = progs[0]
t0 = time.perf_counter()
fn.lower(*a).compile()
note(f"recompile same shape: {time.perf_counter()-t0:.2f}s (in-memory)")
note("done")
