"""Command-line interface: ``annembed-embed`` and ``annembed-dmapembed``.

Mirrors the clap CLIs of the reference (src/bin/embed.rs:185-321,
src/bin/dmapembed.rs:183-306), including the knn construction
subgroup that replaces the reference's ``hnsw`` subcommand.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys



def _common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--csv", required=True, help="input csv file")
    p.add_argument("--outfile", default="embedded.csv")
    p.add_argument("--delim", default=",")
    p.add_argument("--dim", type=int, default=2)
    p.add_argument("--layer", type=int, default=0,
                   help=">0 switches to hierarchical embedding")
    p.add_argument("--fraction", type=float, default=0.05,
                   help="subsample fraction for the hierarchical layer")
    p.add_argument("--sampling", type=float, default=1.0,
                   help="Bernoulli row-subsampling probability")
    p.add_argument("--distance", default="DistL2",
                   choices=["DistL2", "DistL1", "DistCosine",
                            "DistJeffreys", "DistJensenShannon"])
    p.add_argument("--nbng", type=int, default=10,
                   help="number of neighbours in the kNN graph (knbn)")
    # knn construction knobs (replaces the reference `hnsw` subcommand)
    p.add_argument("--nlist", type=int, default=0,
                   help="IVF centroids (0 = auto sqrt(n))")
    p.add_argument("--nprobe", type=int, default=16)
    p.add_argument("--rho", type=float, default=1.0,
                   help="NN-descent candidate sampling fraction "
                        "(Dong's rho-sampling; 1 = full join)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-devices", type=int, default=0,
                   help=">1 runs the pipeline sharded over that many "
                        "devices (1-D data mesh: graph build, spectral "
                        "init, CE optimize, quality)")
    p.add_argument("-v", "--verbose", action="store_true")


def main_embed(argv=None) -> int:
    from .params import KnnParams
    from .api import embed

    p = argparse.ArgumentParser(
        "annembed-embed",
        description="kNN graph + cross-entropy optimized embedding")
    _common_args(p)
    p.add_argument("--batch", type=int, default=20,
                   help="number of gradient batches")
    p.add_argument("--nbsample", type=int, default=10,
                   help="edge samplings per edge per batch")
    p.add_argument("--scale", type=float, default=1.0, help="scale_rho")
    p.add_argument("--quality", action="store_true",
                   help="compute the neighborhood-conservation estimate")
    p.add_argument("--quality-nbng", type=int, default=50,
                   help="embedded neighbourhood size for --quality")
    p.add_argument("--quality-fraction", type=float, default=1.0,
                   help="query-node subsample for --quality (exact "
                        "radii; reference io.rs:197-199 sampling)")
    p.add_argument("--stats", action="store_true",
                   help="intrinsic dimension + hubness statistics "
                        "(reference bin/embed.rs optional stats)")
    p.add_argument("--graph-cache", default=None,
                   help="save/load the kNN graph (npz)")
    p.add_argument("--graph-cache-eager", action="store_true",
                   help="save the graph right after the build "
                        "(crash-safe, like the reference HnswIo dump)")
    p.add_argument("--cluster", type=int, default=0, metavar="MCS",
                   help="run HDBSCAN* on the kNN graph with this "
                        "min_cluster_size; writes clusters.csv next to "
                        "the embedding")
    args = p.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING)

    kp = KnnParams(knbn=args.nbng, distance=args.distance,
                   nlist=args.nlist, nprobe=args.nprobe,
                   nndescent_rho=args.rho)
    y, info = embed(args.csv, outfile=args.outfile, dim=args.dim,
                    batch=args.batch, nbsample=args.nbsample,
                    layer=args.layer, hierarchy_fraction=args.fraction,
                    scale=args.scale, quality_sampling=args.sampling,
                    distance=args.distance, nbng=args.nbng, knn_params=kp,
                    with_quality=args.quality, delim=args.delim,
                    seed=args.seed, graph_cache=args.graph_cache,
                    graph_cache_eager=args.graph_cache_eager,
                    quality_nbng=args.quality_nbng,
                    quality_fraction=args.quality_fraction,
                    cluster=args.cluster, n_devices=args.n_devices)
    out = {"n": int(y.shape[0]), "dim": int(y.shape[1]),
           **{k: v for k, v in info.items()
              if isinstance(v, (int, float, dict))}}
    if "cluster" in out:        # keep only json-safe scalars
        out["cluster"] = {k: v for k, v in out["cluster"].items()
                          if isinstance(v, (int, float))}
    if args.stats:
        from .io.csv_io import get_toembed_from_csv
        from . import (build_kgraph, intrinsic_dim_levina_bickel,
                       intrinsic_dim_2nn, Hubness)
        x = get_toembed_from_csv(args.csv, delimiter=args.delim,
                                 subsample=args.sampling)
        # forward the CLI-tuned kNN knobs (nlist/nprobe/rho) into the
        # stats graph build too
        gs = build_kgraph(x, max(args.nbng, 20), distance=args.distance,
                          params=kp)
        mean, sigma = intrinsic_dim_levina_bickel(gs)
        hub = Hubness.new(gs)
        out["intrinsic_dim"] = [mean, sigma]
        out["intrinsic_dim_2nn"] = intrinsic_dim_2nn(gs)
        out["hubness_skew"] = hub.get_standard3m()
        out["hubness_hist"] = hub.get_hubness_histogram()
    print(json.dumps(out, default=float))
    return 0


def main_dmapembed(argv=None) -> int:
    from .params import KnnParams
    from .api import dmap_embed

    p = argparse.ArgumentParser(
        "annembed-dmapembed", description="diffusion maps embedding")
    _common_args(p)
    p.add_argument("--alfa", type=float, default=1.0)
    p.add_argument("--beta", type=float, default=0.0)
    p.add_argument("--time", type=float, default=5.0, dest="time_param")
    args = p.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING)

    kp = KnnParams(knbn=args.nbng, distance=args.distance,
                   nlist=args.nlist, nprobe=args.nprobe,
                   nndescent_rho=args.rho)
    y, info = dmap_embed(args.csv, outfile=args.outfile, dim=args.dim,
                         alfa=args.alfa, beta=args.beta,
                         time_param=args.time_param,
                         distance=args.distance, nbng=args.nbng,
                         layer=args.layer,
                         hierarchy_fraction=args.fraction, knn_params=kp,
                         quality_sampling=args.sampling, delim=args.delim,
                         seed=args.seed, n_devices=args.n_devices)
    print(json.dumps({"n": int(y.shape[0]), "dim": int(y.shape[1]),
                      "total_time": info["total_time"]}))
    return 0


if __name__ == "__main__":
    prog = sys.argv[1] if len(sys.argv) > 1 else "embed"
    if prog == "dmapembed":
        sys.exit(main_dmapembed(sys.argv[2:]))
    sys.exit(main_embed(sys.argv[1:] if prog != "embed" else sys.argv[2:]))
