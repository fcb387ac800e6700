"""Byte-pair-encoding tokenizer: distributed training + application.

Algorithm: Sennrich, Haddow & Birch, "Neural Machine Translation of
Rare Words with Subword Units" (ACL 2016) — BPE merges learned from a
word-frequency table, most-frequent adjacent symbol pair merged per
iteration. The 100-TB-scale shape mirrors k-means (`cluster.py`): the
corpus-wide passes (pre-tokenization, word counting, final encoding)
are streaming Ray Data `map_batches` + one keyed aggregate, while the
merge loop itself runs over the BOUNDED top-``max_words``
word-frequency aggregate on the driver — the corpus is read exactly
once for training and once for encoding, and no stage ever holds more
than ``max_words`` rows of driver state.

Determinism contract: ties in pair frequency break on the
lexicographically smallest pair; ties in the word top-k break on the
word; so the merge sequence is a pure function of the corpus.

Reference parity: the reference engine has no tokenizer (rdf-diff-store
stores RDF, `src/query.rs`); this is part of the mandated
training-data-pipeline surface beyond it.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle_utils import sort_values_nul_safe

# GPT-2-ish pre-tokenizer: letter runs, digit runs, or punctuation runs
# (whitespace only separates). Case is preserved.
_PRETOK_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")

_EOW = "</w>"  # end-of-word marker, its own terminal symbol


def _word_partial_counts(batch: pa.Table, text_col: str) -> pa.Table:
    """One (word, n) row per DISTINCT word per batch — the shuffle
    carries vocabulary, never text."""
    s = batch[text_col].to_pandas().fillna("")
    words = s.str.findall(_PRETOK_RE).explode().dropna()
    # NUL-safe value_counts: the pandas path folds words differing only
    # past \x00 above a size threshold (CLAUDE.md); np.unique compares
    # full bytes
    vals, counts = np.unique(words.to_numpy(dtype=object),
                             return_counts=True)
    vc = pd.Series(counts, index=vals)
    return pa.table(
        {
            "word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
            "n": pa.array(vc.to_numpy("int64"), pa.int64()),
        }
    )


def word_counts(docs_ds, *, text_col: str = "text",
                max_words: int = 50_000) -> pd.DataFrame:
    """Distributed word-frequency table, truncated to the top
    ``max_words`` by (count DESC, word ASC). The truncation is the
    documented bound that keeps the merge loop driver-sized (standard
    practice: production BPE vocabularies are trained on a frequency
    cutoff or a corpus sample). Per-batch local top-k after the keyed
    sum keeps the driver merge at batches x max_words rows."""

    agg = (
        docs_ds.map_batches(
            lambda b: _word_partial_counts(b, text_col),
            batch_format="pyarrow",
        )
        .groupby("word")
        .sum("n")
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().rename(columns={"sum(n)": "n"})
        if "n" not in df.columns:  # empty-input aggregate has no columns
            df = pd.DataFrame({"word": pd.Series(dtype=object),
                               "n": pd.Series(dtype="int64")})
        df = df.sort_values(
            ["n", "word"], ascending=[False, True], ignore_index=True
        ).head(max_words)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = agg.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if "word" not in parts.columns:
        return pd.DataFrame({"word": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64")})
    return sort_values_nul_safe(
        parts, ["n", "word"], ascending=[False, True], ignore_index=True
    ).head(max_words)


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    """Apply one merge to one word's symbol tuple."""
    out = []
    i, n = 0, len(symbols)
    a, b = pair
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def learn_merges(word_freq: pd.DataFrame, n_merges: int) -> list:
    """The Sennrich et al. merge loop over a bounded (word, n) table,
    with the standard incremental pair-count maintenance: pair counts
    are built once, and each merge updates only the words that contain
    the merged pair (indexed pair -> word ids)."""
    from collections import Counter, defaultdict

    words = [
        tuple(w) + (_EOW,) for w in word_freq["word"].tolist()
    ]
    freqs = word_freq["n"].to_numpy("int64")

    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for wi, syms in enumerate(words):
        f = int(freqs[wi])
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words[(a, b)].add(wi)

    merges = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # deterministic argmax: count DESC, then lexicographic pair ASC
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        for wi in list(pair_words[best]):
            syms = words[wi]
            f = int(freqs[wi])
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(wi)
            new = _merge_word(syms, best)
            words[wi] = new
            for a, b in zip(new, new[1:]):
                pair_counts[(a, b)] += f
                pair_words[(a, b)].add(wi)
    return merges


def bpe_train(docs_ds, *, n_merges: int = 200, max_words: int = 50_000,
              text_col: str = "text") -> list:
    """Train BPE merges over a document Dataset. Returns the ordered
    merge list (the tokenizer model)."""
    wf = word_counts(docs_ds, text_col=text_col, max_words=max_words)
    if not len(wf):
        raise ValueError("cannot train BPE on an empty corpus")
    return learn_merges(wf, n_merges)


def encode_word(word: str, ranks: dict) -> tuple:
    """Encode one word with the trained merges (lowest-rank pair merged
    first — equivalent to replaying the merge sequence)."""
    syms = tuple(word) + (_EOW,)
    while len(syms) > 1:
        pairs = list(zip(syms, syms[1:]))
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, best = min(ranked)
        syms = _merge_word(syms, best)
    return syms


def bpe_token_counts(docs_ds, merges: list, *, text_col: str = "text"):
    """Distributed encode: corpus-wide (token, n) counts under the
    trained merges. The merge table is broadcast once (``ray.put``);
    each batch encodes only its DISTINCT words (per-worker memo — web
    text repeats words heavily) and ships one row per distinct token
    per batch. Caller-visible result is the keyed sum."""
    import ray

    ranks_ref = ray.put({p: i for i, p in enumerate(merges)})
    memo_cache: dict = {}

    def encode_batch(batch: pa.Table) -> pa.Table:
        key = id(ranks_ref)
        if key not in memo_cache:
            memo_cache.clear()
            memo_cache[key] = (ray.get(ranks_ref), {})
        ranks, memo = memo_cache[key]
        s = batch[text_col].to_pandas().fillna("")
        words = s.str.findall(_PRETOK_RE).explode().dropna()
        # NUL-safe value_counts (np.unique full-byte compare; the
        # pandas path folds NUL-twin words above a size threshold)
        _vals, _counts = np.unique(words.to_numpy(dtype=object),
                                   return_counts=True)
        vc = pd.Series(_counts, index=_vals)
        token_counts: dict = {}
        for word, n in vc.items():
            toks = memo.get(word)
            if toks is None:
                toks = encode_word(word, ranks)
                memo[word] = toks
            for t in toks:
                token_counts[t] = token_counts.get(t, 0) + int(n)
        return pa.table(
            {
                "token": pa.array(list(token_counts), pa.string()),
                "n": pa.array(
                    np.fromiter(token_counts.values(), dtype="int64",
                                count=len(token_counts)),
                    pa.int64(),
                ),
            }
        )

    agg = (
        docs_ds.map_batches(encode_batch, batch_format="pyarrow")
        .groupby("token")
        .sum("n")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["token", "n"])

    return agg.map_batches(rename, batch_format="pyarrow")


def bpe_tokens_per_doc(docs_ds, merges: list, *, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Per-document BPE token counts (the length statistic a training
    pipeline samples/packs by): per-worker word->token-length memo,
    vectorized pandas map over each batch's words."""
    import ray

    ranks_ref = ray.put({p: i for i, p in enumerate(merges)})
    memo_cache: dict = {}

    def count_batch(batch: pa.Table) -> pa.Table:
        key = id(ranks_ref)
        if key not in memo_cache:
            memo_cache.clear()
            memo_cache[key] = (ray.get(ranks_ref), {})
        ranks, memo = memo_cache[key]
        df = batch.select([id_col, text_col]).to_pandas()
        words = df[text_col].fillna("").str.findall(_PRETOK_RE)
        ex = df[[id_col]].assign(word=words).explode("word").dropna(
            subset=["word"]
        )
        # drop_duplicates, not .unique(): pd.unique collapses NUL-twin
        # words, so a twin would miss its memo entry (NaN token count)
        uniq = ex["word"].drop_duplicates()
        for w in uniq:
            if w not in memo:
                memo[w] = len(encode_word(w, ranks))
        lens = ex["word"].map(memo).astype("int64")
        per_doc = lens.groupby(ex[id_col], sort=False).sum()
        out = df[[id_col]].copy()
        out["n_tokens"] = (
            out[id_col].map(per_doc).fillna(0).astype("int64")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return docs_ds.map_batches(count_batch, batch_format="pyarrow")


def save_tokenizer(path: str, merges: list, vocab=None) -> None:
    """Persist the trained tokenizer (ordered merge list + optional
    vocab table) as JSON — train once, reuse across shard-writer runs
    (the real-pipeline contract: the tokenizer is FROZEN the moment any
    shard is written with it)."""
    import json
    import os

    obj = {"merges": [list(p) for p in merges]}
    if vocab is not None:
        obj["vocab"] = {
            "token": vocab["token"].tolist(),
            "token_id": [int(i) for i in vocab["token_id"]],
            "n": [int(x) for x in vocab["n"]] if "n" in vocab else None,
        }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def load_tokenizer(path: str):
    """Inverse of :func:`save_tokenizer`. Returns ``(merges, vocab)``
    with merges as the original list of string pairs and vocab a pandas
    DataFrame (or None if the file carries merges only)."""
    import json

    with open(path) as f:
        obj = json.load(f)
    merges = [tuple(p) for p in obj["merges"]]
    vocab = None
    if obj.get("vocab"):
        v = obj["vocab"]
        data = {"token": v["token"], "token_id": v["token_id"]}
        if v.get("n") is not None:
            data["n"] = v["n"]
        vocab = pd.DataFrame(data).astype({"token_id": "int32"})
    return merges, vocab
