"""TPU micro-benchmarks with MFU / roofline accounting (one process so
the axon channel setup is amortized; see PERF.md "the tunnel got worse").

Sections (each prints a JSON line so results are machine-harvestable):
  1. brute kNN 70k x 784 (the bench operating point,
     reference examples/mnist_digits.rs): f32 / bf16 / bf16+ApproxTopK,
     steady wall + achieved FLOP/s vs the v5e bf16 MXU peak.
  2. IVF local join at 2M x 28 (examples/higgs.rs shape): wall +
     useful-FLOP rate (panels whose rows land in real output) and the
     padded-total rate, to show the join is gather-bound, not MXU-bound.
  3. one NN-descent round at rho=1.0 vs 0.5 (Dong et al. candidate
     sampling): wall + recall@12 — the VERDICT-r2 graph-build lever.
  4. one dense optimizer sub-sweep at 70k (production transposed path,
     optim/dense.py): wall + modeled HBM traffic vs the 819 GB/s peak.

Peaks used (public TPU v5e specs): 197 TF/s bf16 MXU, 819 GB/s HBM.
f32 matmuls cannot reach the bf16 peak (the MXU is a bf16 multiplier;
XLA runs f32 as multi-pass), so f32 MFU is reported against the same
197 TF/s for comparability and noted as an upper-bound fraction.
"""
import time, sys, os, json, math, threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
import numpy as np

_DEADLINE_S = float(os.environ.get("ANNEMBED_MB_DEADLINE_S", "3000"))
_T0 = time.monotonic()


def _watchdog():
    while True:
        left = _DEADLINE_S - (time.monotonic() - _T0)
        if left <= 0:
            print("WATCHDOG: hard deadline — exiting 0", file=sys.stderr,
                  flush=True)
            os._exit(0)
        time.sleep(min(left, 5.0))


threading.Thread(target=_watchdog, daemon=True).start()

PEAK_BF16 = 197e12       # v5e MXU, FLOP/s
PEAK_HBM = 819e9         # v5e HBM, byte/s

# smoke-test shrink factors (CI / CPU smoke: MICRO_N70=4000 MICRO_N2M=50000)
N70 = int(os.environ.get("MICRO_N70", "0"))      # 0 = full 70k
N2M = int(os.environ.get("MICRO_N2M", "2000000"))

T0 = time.monotonic()


def note(m):
    print(f"[{time.monotonic()-T0:7.1f}s] {m}", flush=True)


def emit(row):
    print("JSON " + json.dumps(row), flush=True)


import jax, jax.numpy as jnp  # noqa: E402

note(f"devices {jax.devices()}")

from bench import synthetic_mnist  # noqa: E402
from annembed_tpu.knn.brute import knn_graph_brute, knn_search_brute  # noqa: E402
from annembed_tpu.knn.api import recall_at_k  # noqa: E402

x70 = jnp.asarray(synthetic_mnist(n=N70) if N70 else
                  synthetic_mnist()).astype(jnp.float32)
note("70k data on device")

# enter sync mode FIRST so all timings below are honest (PERF.md:
# pre-readback block_until_ready acks are lazy on this tunnel)
t0 = time.monotonic()
_ = float(jnp.ones(()))
note(f"channel ready in {time.monotonic()-t0:.1f}s")


def timed(fn, label, reps=2):
    out = fn()
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        jax.block_until_ready(out)
    w = (time.perf_counter() - t0) / reps
    note(f"{label}: {w:.3f}s steady")
    return out, w


# ---- 1. brute kNN panels ------------------------------------------------
K = 6
n70, d70 = x70.shape
knn_flops = 2.0 * n70 * n70 * d70     # one (n, n) L2 panel == one matmul

(ei, ed), w_f32 = timed(lambda: knn_graph_brute(x70, K, block_rows=2048),
                        "knn f32 exact")
emit({"bench": "knn_brute", "variant": "f32_exact", "wall_s": round(w_f32, 3),
      "tflops": round(knn_flops / w_f32 / 1e12, 1),
      "mfu_vs_bf16_peak": round(knn_flops / w_f32 / PEAK_BF16, 3)})

(bi, bd), w_bf = timed(lambda: knn_graph_brute(x70, K, block_rows=2048,
                                               dtype="bfloat16"),
                       "knn bf16 exact-topk")
agree_bf = float((np.asarray(bi) == np.asarray(ei)).mean())
emit({"bench": "knn_brute", "variant": "bf16_exact_topk",
      "wall_s": round(w_bf, 3), "tflops": round(knn_flops / w_bf / 1e12, 1),
      "mfu_vs_bf16_peak": round(knn_flops / w_bf / PEAK_BF16, 3),
      "agreement_vs_f32": round(agree_bf, 5)})

for rt in (0.95, 0.85):
    (ai, ad), w_ax = timed(
        lambda rt=rt: knn_graph_brute(x70, K, block_rows=2048,
                                      dtype="bfloat16", topk_recall=rt),
        f"knn bf16 approx{rt}")
    agree = float((np.asarray(ai) == np.asarray(ei)).mean())
    emit({"bench": "knn_brute", "variant": f"bf16_approx{rt}",
          "wall_s": round(w_ax, 3),
          "tflops": round(knn_flops / w_ax / 1e12, 1),
          "mfu_vs_bf16_peak": round(knn_flops / w_ax / PEAK_BF16, 3),
          "agreement_vs_f32": round(agree, 5)})

# ---- 4a. dense optimizer sub-sweeps at 70k (production path) -----------
# placed before the 2M section so a timeout still captures it
from annembed_tpu.graph.kgraph import KGraph  # noqa: E402
from annembed_tpu.graph.proba import to_proba_edges  # noqa: E402
from annembed_tpu.optim.dense import run_dense_optimization  # noqa: E402
from annembed_tpu.params import EmbedderParams  # noqa: E402

g70 = KGraph(indices=ei, dists=ed)
npar = to_proba_edges(g70, 0.5, 1.0)
key = jax.random.PRNGKey(0)
y0 = jax.random.uniform(key, (n70, 2), jnp.float32, -5.0, 5.0)

NB = 4
p = EmbedderParams(nb_grad_batch=NB)
_, w_warm = timed(lambda: run_dense_optimization(
    y0, g70, npar, p, n_sub=60)[0], "dense (NB-1)x60 sweeps", reps=1)
# executed sweeps: the optimizer SKIPS the schedule's zero-gamma final
# batch (optim/dense.py total_steps) — dividing by NB*60 understated
# per_sweep by 25% and overstated the HBM fraction by a third
sweeps = max(NB - 1, 0) * 60
per_sweep = w_warm / sweeps
# modeled HBM traffic of one sub-sweep (transposed layout, n_groups=2,
# d=2, k_g=3, n_neg=5): attraction reads y(d,n) own + k_g gathered
# neighbour rows + writes y; edge tables k_g x (idx + 4 f32 aux);
# negatives: n_neg x (read rolled y + read own + write y)
d, k_g, n_neg = 2, 3, 5
bytes_sweep = 4.0 * n70 * (d * (2 + k_g) + k_g * 5 + n_neg * 3 * d)
emit({"bench": "dense_sweep", "n": n70, "per_sweep_ms": round(per_sweep * 1e3, 3),
      "modeled_gb_per_sweep": round(bytes_sweep / 1e9, 4),
      "achieved_gbps": round(bytes_sweep / per_sweep / 1e9, 1),
      "hbm_fraction": round(bytes_sweep / per_sweep / PEAK_HBM, 3)})

# ---- 4d. dmap init at the bench point ----------------------------------
# 0.29 s of the bench e2e; with the optimize at ~0.74 s this is ~25%
# of the remaining wall.  Break out the three stages: fused laplacian
# program, randomized SVD (the subspace iteration's QR chain is the
# suspected floor), spectral coordinate map.
from annembed_tpu.spectral.diffmaps import DiffusionMaps  # noqa: E402
from annembed_tpu.params import DiffusionParams  # noqa: E402

dm70 = DiffusionMaps(params=DiffusionParams(asked_dim=2, alfa=0.5,
                                            beta=-0.1, t=5.0, gnbn=12))
_, w_dm = timed(lambda: dm70.embed_from_kgraph(g70), "dmap init 70k")
lap70 = dm70.laplacian_from_kgraph(g70)
_, w_lap = timed(lambda: dm70.laplacian_from_kgraph(g70).vals,
                 "dmap laplacian 70k")
_, w_svd = timed(lambda: lap70.do_svd(2 + 15).s, "dmap rsvd 70k")
# QR-chain share: one range-finder iteration = 2 SpMM + 4 QR; time a
# bare double-QR on the iterate shape to see if QR dominates
from annembed_tpu.linalg.rsvd import _qr_q  # noqa: E402
panel = jax.random.normal(jax.random.PRNGKey(5), (n70, 30), jnp.float32)
_, w_qr = timed(lambda: _qr_q(panel), "double QR (n,30)")
emit({"bench": "dmap_init", "n": n70, "wall_s": round(w_dm, 3),
      "laplacian_s": round(w_lap, 3), "rsvd_s": round(w_svd, 3),
      "double_qr_s": round(w_qr, 4),
      "coords_s": round(max(w_dm - w_lap - w_svd, 0.0), 3)})

# ---- 4b. gather packing A/B --------------------------------------------
# The 11M sweep floor is the neighbour-coordinate gather: (3, n) indices
# into a (2, n) f32 table ran at ~153M slices/s regardless of locality
# (PERF.md round-3 probe).  If that floor is per-SLICE (issue-bound),
# packing the two f32 coords into one complex64 lane halves the slice
# count's byte overhead changes nothing; if it is per-ELEMENT, packing
# halves the wall — and the sweep can keep a packed mirror of yT for
# one cheap elementwise repack per sweep.  This measures both forms at
# gather-bound scale.
ng = 4_000_000 if not N70 else 50_000
kg_probe = 3
rngp = np.random.default_rng(3)
gidx = jnp.asarray(rngp.integers(0, ng, size=(kg_probe, ng)), jnp.int32)
ytab = jax.random.normal(jax.random.PRNGKey(2), (2, ng), jnp.float32)
ypak = jax.lax.complex(ytab[0], ytab[1])          # (n,) complex64


@jax.jit
def gather_f32_pair(tab, idx):
    return tab[:, idx]                            # (2, kg, n)


@jax.jit
def gather_packed(tab, idx):
    z = tab[idx]                                  # (kg, n) complex64
    return jnp.stack([jnp.real(z), jnp.imag(z)])  # (2, kg, n)


_, w_pair = timed(lambda: gather_f32_pair(ytab, gidx), "gather f32 (2,n)")
out_pak, w_pak = timed(lambda: gather_packed(ypak, gidx),
                       "gather packed complex64")
ok_pack = bool(jnp.allclose(out_pak, gather_f32_pair(ytab, gidx)))
emit({"bench": "gather_packing", "n": ng, "k": kg_probe,
      "pair_wall_s": round(w_pair, 4), "packed_wall_s": round(w_pak, 4),
      "speedup": round(w_pair / w_pak, 2) if w_pak > 0 else 0.0,
      "bit_ok": ok_pack,
      "slices_per_s_pair": round(kg_probe * ng / w_pair / 1e6, 1)})

# row-gather width scaling at NN-descent shapes: (m,) indices into an
# (n, d) corpus at d=28, f32 vs bf16 vs int8.  If the wall scales with
# BYTES, int8 candidate scoring (+exact rerank) cuts the NN-descent
# gather 4x; if it is slice-count-bound (like the tiny-slice probe),
# the lever is dead.  m sized to one rho-0.5 round's candidate volume
# per slab.
drow = 28
xrow = jax.random.normal(jax.random.PRNGKey(4), (ng, drow), jnp.float32)
ridx = jnp.asarray(rngp.integers(0, ng, size=(4 * ng,)), jnp.int32)
for wtag, tab in (("f32", xrow), ("bf16", xrow.astype(jnp.bfloat16)),
                  ("int8", (xrow * 16).astype(jnp.int8))):
    @jax.jit
    def grow(t, i):
        return t[i]
    _, w_row = timed(lambda t=tab: grow(t, ridx), f"rowgather {wtag}")
    emit({"bench": "rowgather_width", "dtype": wtag, "n": ng, "d": drow,
          "rows": int(ridx.shape[0]), "wall_s": round(w_row, 4),
          "gbps": round(ridx.shape[0] * drow
                        * jnp.dtype(tab.dtype).itemsize / w_row / 1e9,
                        1)})

# ---- 2. IVF join at 2M --------------------------------------------------
rng = np.random.default_rng(7)
n2 = N2M
centers = rng.normal(size=(32, 8)).astype(np.float32) * 4.0
lat = centers[rng.integers(0, 32, n2)] + rng.normal(size=(n2, 8)).astype(np.float32)
lift = rng.normal(size=(8, 28)).astype(np.float32)
x2 = lat @ lift + 0.3 * rng.normal(size=(n2, 28)).astype(np.float32)
x2 = (x2 - x2.mean(0)) / np.maximum(x2.std(0), 1e-12)
x2 = jnp.asarray(x2.astype(np.float32))
note("2M data on device")

from annembed_tpu.knn.ivf import knn_graph_ivf  # noqa: E402
from annembed_tpu.knn.nndescent import nndescent_refine  # noqa: E402

kb = 12  # build-k (knbn=6 x factor 2)
nprobe = 16
# sizing from the SAME helper the build uses (knn/ivf.py::ivf_sizing)
# so retuned heuristics cannot silently skew the FLOP accounting
from annembed_tpu.knn.ivf import ivf_sizing  # noqa: E402
nlist, cap, qcap = ivf_sizing(n2, kb)
d2 = x2.shape[1]
# useful panel FLOPs: each real query row scores nprobe*cap candidates
useful_flops = 2.0 * n2 * nprobe * cap * d2
padded_rows = (nlist + n2 // qcap) * qcap        # upper bound w/o trim
padded_flops = 2.0 * padded_rows * nprobe * cap * d2
# A/B the two join layouts: "gathered" = id tables + per-row corpus
# gathers (the measured 0.01%-MFU bottleneck), "sorted" = cell-sorted
# corpus + contiguous slices.  Results are bit-identical (test_ivf.py);
# only the memory-access pattern differs.  Warm pass first (compile
# excluded) so MFU numbers are comparable with the other sections.
for layout in ("gathered", "sorted"):
    t0 = time.perf_counter()
    ii, dd = knn_graph_ivf(x2, kb, nprobe=nprobe, dtype="bfloat16",
                           layout=layout)
    jax.block_until_ready(dd)
    w_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    ii, dd = knn_graph_ivf(x2, kb, nprobe=nprobe, dtype="bfloat16",
                           layout=layout)
    jax.block_until_ready(dd)
    w_ivf = time.perf_counter() - t0
    emit({"bench": "ivf_join", "layout": layout, "n": n2,
          "wall_s": round(w_ivf, 1), "cold_wall_s": round(w_cold, 1),
          "nlist": nlist, "cap": cap, "nprobe": nprobe,
          "useful_tflops": round(useful_flops / w_ivf / 1e12, 2),
          "padded_tflops": round(padded_flops / w_ivf / 1e12, 2),
          "mfu_vs_bf16_peak": round(useful_flops / w_ivf / PEAK_BF16, 4)})

sub = np.sort(rng.choice(n2, 2000, replace=False)).astype(np.int32)
eqi, _ = knn_search_brute(x2[sub], x2, k=kb + 1)
eqi = np.asarray(eqi)
not_self = eqi != sub[:, None]
exact = np.stack([r[m][:kb] for r, m in zip(eqi, not_self)])
rec_ivf = recall_at_k(np.asarray(ii)[sub], exact)
note(f"IVF recall@{kb}: {rec_ivf:.4f}")
emit({"bench": "ivf_join_recall", "recall_at_k": round(float(rec_ivf), 4)})

# ---- 3. NN-descent rho-sampling ----------------------------------------
for rho, rounds in ((1.0, 1), (0.5, 1), (0.5, 2)):
    t0 = time.perf_counter()
    ri, rd = nndescent_refine(x2, ii, dd, n_rounds=rounds,
                              dtype="bfloat16", rho=rho)
    jax.block_until_ready(rd)
    w = time.perf_counter() - t0
    rec = recall_at_k(np.asarray(ri)[sub], exact)
    emit({"bench": "nndescent", "rho": rho, "rounds": rounds,
          "wall_s": round(w, 1), "recall_at_k": round(float(rec), 4),
          # first config of each shape pays the slab compile; later
          # ones reuse it — not directly comparable to warmed sections
          "includes_compile": True})

# ---- 4c. dense sweep at 2M: flat vs node blocks ------------------------
# Per-sweep wall in the gather-bound regime (PERF.md: 0.22 s/sweep at
# 11M).  Blocks cut the per-batch gather volume by n_blocks at the
# quality cost measured in the granularity study; this pins the actual
# s/sweep so the 11M wall/quality Pareto can be planned from numbers.
g2 = KGraph(indices=ii, dists=dd)
npar2 = to_proba_edges(g2, 0.5, 1.0)
y2_0 = jax.random.uniform(jax.random.PRNGKey(1), (n2, 2), jnp.float32,
                          -5.0, 5.0)
for tag, blocks, n_sub_b in (("flat", 1, 12), ("B4", 4, 48)):
    p2 = EmbedderParams(nb_grad_batch=2, dense_n_blocks=blocks)
    _, w_d2 = timed(lambda p2=p2, ns=n_sub_b: run_dense_optimization(
        y2_0, g2, npar2, p2, n_sub=ns)[0],
        f"dense 2M {tag}", reps=1)
    sweeps_b = 1 * n_sub_b
    emit({"bench": "dense_sweep_2m", "variant": tag, "n": n2,
          "n_blocks": blocks, "per_sweep_ms": round(w_d2 / sweeps_b * 1e3, 2),
          "batch_wall_s": round(w_d2, 2)})

note("done")
