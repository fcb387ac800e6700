"""Benchmark harness.

Runs the headline KG-construction build (pages → delta log) plus a set of
representative operator pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "kg_build_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "pages": N, "triples": N, "triples_per_sec": N}

``--scaling``: runs the same benchmark twice in fresh interpreter
processes at num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs plus scaling efficiency = (t8/t32)/(32/8). 1.0 = linear.

Corpus generation (driver-side, deterministic) is cached under
/tmp/ray_kg_bench and excluded from timing; an untimed warm-up read primes
the page cache so measurements capture compute + shuffle, not first-touch
disk I/O.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_CACHE = "/tmp/ray_kg_bench"

# corpus scale tracks the sf's lineitem row count (documents barely scale)
_SCALE_URLS = {"sf0.001": 400, "sf0.01": 1200, "sf0.1": 4000}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_corpus(sf_dir: str) -> str:
    from rdf_diff_store_ray import corpus as corpus_mod

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    n_urls = _SCALE_URLS.get(tag, 1200)
    cdir = os.path.join(BENCH_CACHE, f"{tag}_u{n_urls}")
    if not os.path.exists(os.path.join(cdir, "pages.parquet")):
        log(f"[bench] generating corpus n_urls={n_urls} → {cdir}")
        t0 = time.monotonic()
        c = corpus_mod.generate(n_urls=n_urls, n_snapshots=6, seed=42)
        c.write(cdir)
        log(f"[bench] corpus generated in {time.monotonic() - t0:.1f}s "
            f"({c.pages.num_rows} pages)")
    return cdir


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from rdf_diff_store_ray.pipelines import queries as q
    from rdf_diff_store_ray.pipelines.build import build

    cdir = ensure_corpus(SF_DIR)
    with open(os.path.join(cdir, "gazetteer.json")) as f:
        gaz = json.load(f)
    pages_path = os.path.join(cdir, "pages.parquet")
    n_pages = pq.ParquetFile(pages_path).metadata.num_rows

    # untimed warm-up read (page cache)
    pq.read_table(pages_path)

    out_dir = os.path.join(BENCH_CACHE, f"run_cpus{NUM_CPUS}")
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    res = build(pages_path, out_dir, gazetteer=gaz, num_partitions=32,
                resume=False, batch_size=512, actor_pool=(2, 12))
    build_sec = time.monotonic() - t0
    n_triples = pads.dataset(
        sorted(glob.glob(os.path.join(res.out_dir, "triples", "*.parquet")))
    ).count_rows()
    log(f"[bench] build {build_sec:.2f}s, {n_pages} pages, {n_triples} triples")

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t = time.monotonic()
        out = fn(SF_DIR)
        # consume lazily-built datasets
        if hasattr(out, "count") and not hasattr(out, "num_rows"):
            out.count()
        timings[name] = round(time.monotonic() - t, 3)
        log(f"[bench] {name}: {timings[name]}s")

    timed("q1_pricing_summary", q.registry()["q1_pricing_summary"])
    timed("events_hourly", q.registry()["events_hourly"])
    timed("events_change_log", q.registry()["events_change_log"])
    timed("exact_dedup", q.registry()["exact_dedup"])
    timed("minhash_dedup", q.registry()["minhash_dedup"])
    timed("ann_topk", q.registry()["ann_topk"])
    timed("doc_stats", q.registry()["doc_stats"])

    result = {
        "metric": "kg_build_sec",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(os.path.normpath(SF_DIR)),
        "num_cpus": NUM_CPUS,
        "pages": int(n_pages),
        "triples": int(n_triples),
        "pages_per_sec": round(n_pages / build_sec, 1),
        "triples_per_sec": round(n_triples / build_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = 8, 32
    lo = run(lo_cpus)
    hi = run(hi_cpus)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "pages_per_sec_8": lo["pages_per_sec"],
        "pages_per_sec_32": hi["pages_per_sec"],
        "triples_per_sec_8": lo["triples_per_sec"],
        "triples_per_sec_32": hi["triples_per_sec"],
        "sf": lo["sf"],
        "pages": lo["pages"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
