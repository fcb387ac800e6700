"""Char-n-gram language-model perplexity scoring — the CCNet quality
signal (Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data": rank web documents by the perplexity of
an LM trained on a trusted reference corpus). KenLM is replaced by a
byte-trigram model with stupid backoff (Brants et al. 2007, "Large
Language Models in Machine Translation" — the web-scale smoothing that
needs only counts), so training is two streaming Ray Data passes and
scoring is one, all vectorized numpy over UTF-8 byte arrays.

Scale shape: the count aggregate's key space is intrinsically bounded
(<= 256^3 trigrams regardless of corpus size), the shuffle carries one
row per DISTINCT n-gram per batch, and the fitted model (three sorted
key/count arrays) is broadcast once via ``ray.put``. The corpus is
never materialized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_BACKOFF = 0.4  # stupid-backoff discount (Brants et al. 2007)
_ORDER_SHIFT = np.int64(1) << np.int64(24)


def _byte_arrays(texts: "pd.Series"):
    """Concatenate a batch's documents into one uint8 array with a
    per-position doc index (the span-dedup batching trick — windows
    never cross documents because validity is checked on doc_of)."""
    bs = texts.fillna("").str.encode("utf-8")
    lens = bs.str.len().to_numpy("int64")
    flat = np.frombuffer(b"".join(bs.tolist()), dtype=np.uint8)
    doc_of = np.repeat(np.arange(len(lens)), lens)
    starts = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return flat, doc_of, lens, starts


def _ngram_keys(flat: np.ndarray, doc_of: np.ndarray, order: int):
    """Integer keys of all in-document ``order``-grams (big-endian byte
    fold) and the positions of their LAST byte."""
    n = len(flat)
    if n < order:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    acc = np.zeros(n - order + 1, np.int64)
    f = flat.astype(np.int64)
    for k in range(order):
        acc = (acc << np.int64(8)) | f[k:n - order + 1 + k]
    valid = doc_of[: n - order + 1] == doc_of[order - 1:]
    return acc[valid], np.flatnonzero(valid) + (order - 1)


def char_lm_train(docs_ds, *, text_col: str = "text",
                  max_ngrams: int = 2_000_000):
    """Train byte uni/bi/trigram counts over a Dataset. Returns the
    model dict of sorted key/count arrays (+ total byte count). The
    ``max_ngrams`` cap bounds the driver fold per order (counts are
    truncated lowest-frequency-first, ties on key — deterministic)."""

    def partials(batch: pa.Table) -> pa.Table:
        flat, doc_of, _, _ = _byte_arrays(batch[text_col].to_pandas())
        keys, counts = [], []
        for order in (1, 2, 3):
            kk, _ = _ngram_keys(flat, doc_of, order)
            vals, cnts = np.unique(kk, return_counts=True)
            keys.append(np.int64(order) * _ORDER_SHIFT * np.int64(256)
                        + vals)
            counts.append(cnts.astype("int64"))
        return pa.table(
            {
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "n": pa.array(np.concatenate(counts), pa.int64()),
            }
        )

    agg = (
        docs_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("key").sum("n")
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().rename(columns={"sum(n)": "n"})
        if "n" not in df.columns:
            df = pd.DataFrame({"key": pd.Series(dtype="int64"),
                               "n": pd.Series(dtype="int64")})
        df = df.sort_values(["n", "key"], ascending=[False, True],
                            ignore_index=True).head(max_ngrams)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = agg.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if "key" not in parts.columns or not len(parts):
        raise ValueError("cannot train an LM on an empty corpus")
    parts = parts.sort_values(["n", "key"], ascending=[False, True],
                              ignore_index=True).head(max_ngrams)

    model = {}
    shift = _ORDER_SHIFT * np.int64(256)
    orders = parts["key"].to_numpy("int64") // shift
    raw = parts["key"].to_numpy("int64") % shift
    ns = parts["n"].to_numpy("int64")
    for order, name in ((1, "uni"), (2, "bi"), (3, "tri")):
        m = orders == order
        k, n = raw[m], ns[m]
        srt = np.argsort(k)
        model[f"{name}_keys"] = k[srt]
        model[f"{name}_counts"] = n[srt]
    model["total"] = int(model["uni_counts"].sum())
    if model["total"] == 0:
        raise ValueError("cannot train an LM on an empty corpus")
    return model


def _lookup(keys: np.ndarray, counts: np.ndarray, q: np.ndarray):
    """Vectorized sorted-array lookup: (count, found) per query."""
    if not len(keys):
        return np.zeros(len(q), np.int64), np.zeros(len(q), bool)
    pos = np.clip(np.searchsorted(keys, q), 0, len(keys) - 1)
    found = keys[pos] == q
    return np.where(found, counts[pos], 0), found


def _score_positions(flat, doc_of, model):
    """log stupid-backoff score per byte position (every position gets
    a score: trigram when a full in-doc context exists AND its bigram
    prefix survived truncation, else discounted bigram, else
    discounted unigram, else a discounted uniform floor)."""
    n = len(flat)
    f = flat.astype(np.int64)
    total = float(model["total"])

    # unigram prob per position (floor: unseen byte -> 1/(2*total))
    uc, _ = _lookup(model["uni_keys"], model["uni_counts"], f)
    p = np.maximum(uc.astype(np.float64), 0.5) / total

    # bigram positions: prob of byte i given byte i-1
    bk, bpos = _ngram_keys(flat, doc_of, 2)
    if len(bk):
        bc, bfound = _lookup(model["bi_keys"], model["bi_counts"], bk)
        pk = bk >> np.int64(8)
        pc_, pfound = _lookup(model["uni_keys"], model["uni_counts"], pk)
        ok = bfound & pfound & (pc_ > 0)
        pb = np.where(ok, bc / np.maximum(pc_, 1), 0.0)
        # positions WITH a bigram context but no bigram hit pay backoff
        p2 = p.copy()
        p2[bpos] = np.where(ok, pb, _BACKOFF * p[bpos])
        p = p2

    tk, tpos = _ngram_keys(flat, doc_of, 3)
    if len(tk):
        tc, tfound = _lookup(model["tri_keys"], model["tri_counts"], tk)
        pk = tk >> np.int64(8)
        pc_, pfound = _lookup(model["bi_keys"], model["bi_counts"], pk)
        ok = tfound & pfound & (pc_ > 0)
        pt = np.where(ok, tc / np.maximum(pc_, 1), 0.0)
        p3 = p.copy()
        p3[tpos] = np.where(ok, pt, _BACKOFF * p[tpos])
        p = p3
    return np.log(p)


def lm_perplexity(docs_ds, model, *, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Score each document: mean per-byte negative log score under the
    broadcast model -> perplexity. Returns
    (id, <passthrough columns>, n_bytes, logprob_x1000, ppl_x100) with
    the rounded-integer columns as the platform-stable report surface;
    any other input columns (e.g. ``lang``) pass through so downstream
    aggregates need no driver-side re-join."""
    import ray

    model_ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        s = batch[text_col].to_pandas()
        flat, doc_of, lens, _ = _byte_arrays(s)
        if len(flat):
            logp = _score_positions(flat, doc_of, m)
            sums = np.bincount(doc_of, weights=logp, minlength=len(lens))
        else:
            sums = np.zeros(len(lens))
        mean = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
        ppl = np.exp(-mean)
        cols = {
            c: batch[c] for c in batch.column_names if c != text_col
        }
        cols["n_bytes"] = pa.array(lens, pa.int64())
        cols["logprob_x1000"] = pa.array(
            np.round(sums * 1000).astype("int64"), pa.int64()
        )
        cols["ppl_x100"] = pa.array(
            np.round(ppl * 100).astype("int64"), pa.int64()
        )
        return pa.table(cols)

    return docs_ds.map_batches(score, batch_format="pyarrow")
