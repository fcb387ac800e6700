"""Driver-vs-distributed canonical-map divergence measurement.

Runs the canonical-map stage at a growing surface vocabulary (the
``vocab_per_page`` corpus knob: distinct surfaces grow linearly with
pages) in FRESH subprocesses, recording for each path:

- wall seconds of the map build itself (honest only with
  ``KG_DIV_TRACE=0``; tracemalloc slows Python-heavy driver code),
- peak driver-heap allocation of the build (tracemalloc; the driver
  path's ``take_all`` + union-find + dict + ``ray.put`` all land on the
  driver heap; the distributed path never collects the vocabulary).

This is the evidence behind ``build(canonical_map="auto")``'s threshold
(VERDICT r4 #6): the driver dict's memory grows linearly with the
vocabulary while the distributed store stays flat.

Usage:  python scripts/canonmap_divergence.py [vocab_sizes...]
Writes one JSON line per (mode, vocab) to stdout; everything else on
stderr. Corpora cache under /tmp/ray_kg_vocab.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, tracemalloc
sys.path.insert(0, %(repo)r)
mode, cdir = sys.argv[1], sys.argv[2]
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
with open(os.path.join(cdir, "gazetteer.json")) as f:
    gaz = json.load(f)
raw_ds = rd.read_parquet(os.path.join(cdir, "raw"))
# tracemalloc isolates DRIVER-heap allocations of the map build itself
# (the vocabulary take_all + union-find + dict on the driver path;
# ~nothing on the distributed path) from Ray's own baseline. It slows
# Python-heavy driver code, so walls are honest only with KG_DIV_TRACE=0
# (report walls from an untraced run, heap from a traced one).
trace = os.environ.get("KG_DIV_TRACE", "1") != "0"
if mode in ("extend-driver", "extend-distributed"):
    # incremental-extension divergence: build the base map/store from
    # the corpus (untimed), then time extending it with the SAME fixed
    # batch at every base size — the full raw dataset of the u=1000
    # knob corpus (~4.5k distinct surfaces). The driver path
    # re-clusters the whole vocabulary per batch (O(vocab)), the store
    # path probes its band index (O(batch)).
    import pyarrow.dataset as pads
    import ray.data as rd2
    batch_dir = os.path.join(os.path.dirname(cdir.rstrip("/")),
                             "u1000_v4", "raw")
    batch_ds = rd2.read_parquet(batch_dir)
    if mode == "extend-driver":
        from rdf_diff_store_ray.stages.canonicalize import (
            build_canonical_map, extend_canonical_map)
        base = build_canonical_map(raw_ds, gaz)
        t0 = time.monotonic()
        cm = extend_canonical_map(base, batch_ds, gaz)
        wall = time.monotonic() - t0
        n = len(cm)
    else:
        from rdf_diff_store_ray.stages import canonmap
        import shutil
        out = os.path.join("/dev/shm", "vocab_canon_store")
        shutil.rmtree(out, ignore_errors=True)
        canonmap.build_canonical_store(raw_ds, gaz, out)
        t0 = time.monotonic()
        canonmap.extend_canonical_store(batch_ds, gaz, out)
        wall = time.monotonic() - t0
        n = canonmap.map_size(out)
        shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"mode": mode, "map_size": n,
                      "wall_s": round(wall, 2)}))
    ray.shutdown()
    raise SystemExit(0)
if trace:
    tracemalloc.start()
t0 = time.monotonic()
if mode == "driver":
    from rdf_diff_store_ray.stages.canonicalize import build_canonical_map
    cm = build_canonical_map(raw_ds, gaz)
    import ray as _r
    ref = _r.put(cm)  # the broadcast is part of the driver path's cost
    n = len(cm)
else:
    from rdf_diff_store_ray.stages import canonmap
    import shutil
    out = os.path.join("/dev/shm", "vocab_canon_store")
    shutil.rmtree(out, ignore_errors=True)
    canonmap.build_canonical_store(raw_ds, gaz, out)
    n = canonmap.map_size(out)
    shutil.rmtree(out, ignore_errors=True)
wall = time.monotonic() - t0
row = {"mode": mode, "map_size": n, "wall_s": round(wall, 2)}
if trace:
    cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    row["driver_heap_peak_mb"] = round(peak / 2**20, 1)
print(json.dumps(row))
ray.shutdown()
""" % {"repo": REPO}


def ensure_corpus(n_urls: int, vpp: int) -> str:
    sys.path.insert(0, REPO)
    cdir = f"/tmp/ray_kg_vocab/u{n_urls}_v{vpp}"
    if os.path.exists(os.path.join(cdir, "raw", "_SUCCESS")):
        return cdir
    print(f"[divergence] generating corpus u={n_urls} vpp={vpp}",
          file=sys.stderr, flush=True)
    from rdf_diff_store_ray import corpus as corpus_mod

    c = corpus_mod.generate(n_urls=n_urls, n_snapshots=3, seed=42,
                            vocab_per_page=vpp)
    c.write(cdir)
    # pre-extract once (the raw checkpoint both map paths consume); a
    # subprocess owns the Ray session so this parent never inits Ray
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import ray, ray.data as rd\n"
        "ray.init(address='local', num_cpus=32, include_dashboard=False,"
        " logging_level='ERROR')\n"
        "from ray.data import DataContext\n"
        "DataContext.get_current().enable_progress_bars = False\n"
        "from rdf_diff_store_ray.stages.extract import extract_batch\n"
        "from rdf_diff_store_ray.stages import ner\n"
        "ds = rd.read_parquet(%r, columns=['url','warc_ts','html','text',"
        "'lang'])\n"
        "ds.map_batches(extract_batch, fn_kwargs={'enforce':'raise'},"
        " batch_format='pyarrow').map_batches(ner.page_relations_batch,"
        " batch_format='pyarrow').write_parquet(%r)\n"
        "open(%r, 'w').write('')\n"
        "ray.shutdown()\n"
    ) % (REPO, os.path.join(cdir, "pages.parquet"),
         os.path.join(cdir, "raw"), os.path.join(cdir, "raw", "_SUCCESS"))
    subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO)
    return cdir


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sizes = [int(a) for a in args] or [4000, 16000, 64000, 128000]
    vpp = 4
    modes = (("extend-driver", "extend-distributed")
             if "--extend" in sys.argv else ("driver", "distributed"))
    if "--extend" in sys.argv:
        ensure_corpus(1000, vpp)  # the fixed extension batch
    for n_urls in sizes:
        cdir = ensure_corpus(n_urls, vpp)
        for mode in modes:
            out = subprocess.run(
                [sys.executable, "-c", CHILD, mode, cdir],
                capture_output=True, text=True, check=True, cwd=REPO,
            ).stdout
            row = json.loads(out.strip().splitlines()[-1])
            row["n_urls"] = n_urls
            row["vocab_per_page"] = vpp
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
