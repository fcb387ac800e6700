"""Text analysis operators: token counting, quality scoring, document
fingerprinting, language identification.

All hot paths are vectorized (``pyarrow.compute`` regex kernels) — no
Python loop over rows except the hash fingerprint (hashlib per row, which
is the kernel). Counts are integers so results hash-stably against a SQL
oracle (float ratios are derivable downstream).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

from ..shuffle_utils import sort_values_nul_safe

# regex classes chosen to behave identically in RE2 (pyarrow) and DuckDB
TOKEN_PATTERN = r"\S+"
DIGIT_PATTERN = r"[0-9]"
PUNCT_PATTERN = r"[^a-zA-Z0-9 \t\n]"


def doc_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id + integer quality counters (vectorized)."""
    text = batch["text"]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
            "n_tokens": pc.count_substring_regex(text, TOKEN_PATTERN).cast(pa.int64()),
            "n_digits": pc.count_substring_regex(text, DIGIT_PATTERN).cast(pa.int64()),
            "n_punct": pc.count_substring_regex(text, PUNCT_PATTERN).cast(pa.int64()),
        }
    )


# Whole-word stopword alternation; RE2 semantics identical in pyarrow and
# DuckDB (both count non-overlapping left-to-right matches).
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "was", "for", "with")
STOPWORD_PATTERN = r"\b(" + "|".join(STOPWORDS) + r")\b"
# BPE-ish pre-tokenizer: alpha runs | digit runs | single non-space symbol
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
ALPHA_PATTERN = r"[a-zA-Z]"
UPPER_PATTERN = r"[A-Z]"


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Quality counters + gate, all integer/boolean so the result is
    hash-stable against the DuckDB oracle.

    ``quality_ok`` uses integer cross-multiplication instead of float
    ratios: stopword ratio ≥ 1% ⇔ ``100*n_stopwords >= n_tokens``; alpha
    ratio ≥ 50% ⇔ ``2*n_alpha >= n_chars``.
    """
    text = batch["text"]
    lower = pc.utf8_lower(text)
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = pc.count_substring_regex(text, TOKEN_PATTERN).cast(pa.int64())
    n_alpha = pc.count_substring_regex(text, ALPHA_PATTERN).cast(pa.int64())
    n_upper = pc.count_substring_regex(text, UPPER_PATTERN).cast(pa.int64())
    n_stop = pc.count_substring_regex(lower, STOPWORD_PATTERN).cast(pa.int64())
    n_bpe = pc.count_substring_regex(text, BPE_PATTERN).cast(pa.int64())
    ok = pc.and_(
        pc.and_(
            pc.greater_equal(n_tokens, pa.scalar(10, pa.int64())),
            pc.greater_equal(pc.multiply(n_stop, pa.scalar(100, pa.int64())), n_tokens),
        ),
        pc.greater_equal(pc.multiply(n_alpha, pa.scalar(2, pa.int64())), n_chars),
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_alpha": n_alpha,
            "n_upper": n_upper,
            "n_stopwords": n_stop,
            "n_bpe_tokens": n_bpe,
            "quality_ok": ok,
        }
    )


def compression_stats_batch(batch: pa.Table, *, level: int = 6,
                            flag_num: int = 3,
                            flag_den: int = 10) -> pa.Table:
    """Per-document zlib compression ratio — the classic
    repetition/boilerplate quality signal (machine-generated and
    template-stuffed pages compress far better than prose; the Gopher
    rules family uses exactly this). All-integer output so digests are
    stable: ``ratio_ppm = compressed*1_000_000 / raw`` (floor), and
    ``too_compressible`` flags docs whose compressed size is under
    ``flag_num/flag_den`` of raw (default 0.3 — natural English sits
    near 0.35-0.45 at level 6; duplicated-line spam lands far below).
    Compression is per row but C-speed (zlib) — the same cost shape as
    the digest stage; empty/null text flags false with ratio 10^6."""
    import zlib

    import numpy as np

    ids = batch["doc_id"]
    raw = [t.encode() if t is not None else b""
           for t in batch["text"].to_pylist()]
    comp = np.array([len(zlib.compress(b, level)) for b in raw],
                    dtype=np.int64)
    rawlen = np.array([len(b) for b in raw], dtype=np.int64)
    ratio = np.where(rawlen > 0, comp * 1_000_000 // np.maximum(rawlen, 1),
                     1_000_000)
    return pa.table(
        {
            "doc_id": ids,
            "raw_bytes": rawlen,
            "compressed_bytes": comp,
            "ratio_ppm": ratio,
            "too_compressible": (comp * flag_den < rawlen * flag_num)
            & (rawlen > 0),
        }
    )


def compression_stats(docs_ds, **kw):
    return docs_ds.map_batches(
        lambda b: compression_stats_batch(b, **kw), batch_format="pyarrow")


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """MD5 content fingerprint (hex, lowercase — DuckDB ``md5()``-equal)."""
    digests = [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
        for t in batch["text"].to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(digests, pa.string()),
        }
    )


def rolling_fingerprint(text: str, window: int = 64, base: int = 257,
                        mod: int = (1 << 61) - 1) -> int:
    """Deterministic rolling (Rabin-Karp) hash over the whole document —
    the incremental-fingerprint primitive (content-defined chunking uses
    the per-position values; here we return the final state)."""
    h = 0
    pw = pow(base, window - 1, mod)
    buf: list[int] = []
    for ch in text.encode("utf-8"):
        if len(buf) == window:
            h = (h - buf.pop(0) * pw) % mod
        h = (h * base + ch) % mod
        buf.append(ch)
    return h


class LangId:
    """Character n-gram + stopword language heuristic (actor-pool stage).

    Profiles are built once per actor in ``__init__``. Scoring: stopword
    hit-rate per language plus trigram-profile overlap; deterministic
    argmax with lexicographic tie-break. Closed-world over the profile
    set; returns ``und`` when nothing scores.
    """

    PROFILES = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "was", "for", "with"},
        "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "für", "von"},
        "fr": {"le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"},
        "es": {"el", "la", "los", "y", "es", "una", "para", "en", "que", "por"},
        "no": {"og", "det", "er", "en", "til", "på", "ikke", "som", "av", "har"},
    }

    def __init__(self) -> None:
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def classify(self, text: str) -> str:
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und"
        best_lang, best_score = "und", 0.0
        for lang in sorted(self.profiles):
            hits = sum(1 for w in words if w in self.profiles[lang])
            score = hits / len(words)
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang if best_score > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds, pa.string()),
            }
        )


# composite keep/drop rules, FineWeb/CCNet-style, in priority order.
# Every threshold is an integer cross-multiplication (never a float
# ratio) so the verdicts hash-stably match the SQL oracle.
NONSPACE_PATTERN = r"\S"
FILTER_RULES = (
    "too_short",      # n_tokens < 20
    "too_long",       # n_tokens > 20000
    "digit_heavy",    # n_digits/n_chars > 0.2   ⇔ 5*d > c
    "punct_heavy",    # n_punct/n_chars > 0.3    ⇔ 10*p > 3*c
    "low_alpha",      # n_alpha/n_chars < 0.5    ⇔ 2*a < c
    "few_stopwords",  # n_stop/n_tokens < 0.02   ⇔ 50*s < t
    "word_len_low",   # nonspace chars per token < 2  ⇔ ns < 2*t
    "word_len_high",  # nonspace chars per token > 12 ⇔ ns > 12*t
)


def fineweb_filter_batch(batch: pa.Table) -> pa.Table:
    """Composite quality filter: the keep/drop decision a FineWeb/CCNet
    cleaning stage makes, with the FIRST failing rule as attribution
    (deterministic priority order ``FILTER_RULES``). One vectorized pass
    — every signal is a pyarrow regex-count kernel over the batch."""
    text = batch["text"]
    c = pc.utf8_length(text).cast(pa.int64())
    t = pc.count_substring_regex(text, TOKEN_PATTERN).cast(pa.int64())
    d = pc.count_substring_regex(text, DIGIT_PATTERN).cast(pa.int64())
    p = pc.count_substring_regex(text, PUNCT_PATTERN).cast(pa.int64())
    a = pc.count_substring_regex(text, ALPHA_PATTERN).cast(pa.int64())
    s = pc.count_substring_regex(
        pc.utf8_lower(text), STOPWORD_PATTERN
    ).cast(pa.int64())
    ns = pc.count_substring_regex(text, NONSPACE_PATTERN).cast(pa.int64())
    two = pa.scalar(2, pa.int64())
    conds = {
        "too_short": pc.less(t, 20),
        "too_long": pc.greater(t, 20000),
        "digit_heavy": pc.greater(pc.multiply(d, 5), c),
        "punct_heavy": pc.greater(pc.multiply(p, 10), pc.multiply(c, 3)),
        "low_alpha": pc.less(pc.multiply(a, two), c),
        "few_stopwords": pc.less(pc.multiply(s, 50), t),
        "word_len_low": pc.less(ns, pc.multiply(t, two)),
        "word_len_high": pc.greater(ns, pc.multiply(t, 12)),
    }
    # first failing rule wins: fold the chain back-to-front so earlier
    # rules overwrite later ones
    reason = pa.array([""] * batch.num_rows, pa.string())
    for name in reversed(FILTER_RULES):
        reason = pc.if_else(conds[name], pa.scalar(name), reason)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": t,
            "keep": pc.equal(reason, ""),
            "reason": reason,
        }
    )


def fineweb_filter(docs_ds):
    return docs_ds.map_batches(fineweb_filter_batch, batch_format="pyarrow")


def heavy_hitters(docs_ds, k: int = 50, depth: int = 4, width: int = 8192,
                  text_col: str = "text", candidates_per_batch: int = 512):
    """Approximate top-k tokens via a Count-Min sketch (the mergeable
    heavy-hitter sketch beside the HLL distinct sketch): each batch
    folds its token counts into a depth x width int64 matrix (double
    hashing over two stable 64-bit line hashes) plus its local top
    candidates; the driver sums the matrices — a tree-reduce of fixed
    ~``depth*width*8``-byte partials, never a token shuffle — and
    estimates each merged candidate as the row-wise minimum. CMS never
    underestimates, so the exact top-k is always a subset of the
    candidate set when ``candidates_per_batch`` >= k. Returns
    (token, est_count) sorted by (-est_count, token)."""
    import numpy as np
    import pandas as pd

    def _cms_rows(tokens: pd.Series):
        h1 = pd.util.hash_pandas_object(tokens, index=False,
                                        categorize=False).to_numpy("uint64")
        h2 = pd.util.hash_pandas_object(tokens + "\x1fcms", index=False,
                                        categorize=False).to_numpy("uint64")
        return np.stack(
            [((h1 + np.uint64(d) * h2) % np.uint64(width)).astype(np.int64)
             for d in range(depth)]
        )  # (depth, n)

    def partial(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas()
        toks = s.str.findall(TOKEN_PATTERN).explode().dropna()
        # np.unique counts (NUL-safe), ordered count-desc like the
        # value_counts it replaces so candidate picking is unchanged
        uniq, cnt = np.unique(toks.to_numpy(dtype=object),
                              return_counts=True)
        order = np.lexsort((uniq, -cnt))
        tokens = pd.Series(uniq[order].astype(str))
        counts = cnt[order].astype("int64")
        mat = np.zeros((depth, width), dtype=np.int64)
        if len(tokens):
            idx = _cms_rows(tokens)
            for d in range(depth):
                np.add.at(mat[d], idx[d], counts)
        cand = tokens[:candidates_per_batch].tolist()  # vc is count-desc
        return pa.table(
            {
                "mat": pa.array([mat.ravel().tolist()],
                                pa.list_(pa.int64())),
                "candidates": pa.array([cand], pa.list_(pa.string())),
            }
        )

    parts = docs_ds.map_batches(partial, batch_format="pyarrow")
    mat = np.zeros(depth * width, dtype=np.int64)
    cands: set = set()
    for row in parts.iter_rows():  # one fixed-size partial per batch
        mat += np.asarray(row["mat"], dtype=np.int64)
        cands.update(row["candidates"])
    mat = mat.reshape(depth, width)
    tokens = pd.Series(sorted(cands), dtype=str)
    if len(tokens):
        idx = _cms_rows(tokens)
        est = np.min(
            np.stack([mat[d][idx[d]] for d in range(depth)]), axis=0
        )
    else:
        est = np.array([], dtype=np.int64)
    out = pd.DataFrame({"token": tokens, "est_count": est})
    out = out.sort_values(
        ["est_count", "token"], ascending=[False, True], ignore_index=True
    ).head(k)
    return pa.Table.from_pandas(out, preserve_index=False)


def _line_hashes(lines: "pd.Series") -> "np.ndarray":
    """Stable 64-bit content hash per line (pandas siphash with its
    fixed default key — deterministic across processes, vectorized)."""
    import pandas as pd

    return pd.util.hash_pandas_object(lines, index=False,
                                      categorize=False).to_numpy("uint64")


def line_dedup(docs_ds, min_dup: int = 2, id_col: str = "doc_id",
               text_col: str = "text", max_dup_lines: int = 2_000_000):
    """Corpus-level duplicated-line removal — the CCNet/RefinedWeb
    boilerplate scrub: every line occurring in >= ``min_dup`` documents'
    worth of lines is dropped from EVERY document.

    Two streaming passes: (1) per-batch partial line-hash counts, a
    shuffle over DISTINCT line hashes only (never text), (2) the
    duplicated-hash set — bounded by the boilerplate vocabulary, capped
    at ``max_dup_lines`` with a hard error, broadcast once via
    ``ray.put`` — filters each document's lines in place. Returns
    (id, clean_text, n_lines, n_dropped) and never materializes the
    corpus anywhere."""
    import numpy as np
    import pandas as pd
    import ray

    def partial_counts(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas()
        lines = s.str.split("\n").explode()
        lines = lines[lines.str.len() > 0]
        h = pd.Series(_line_hashes(lines))
        vc = h.value_counts()
        # int64 VIEW of the uint64 hash (a bijection, equality-only use):
        # values past 2^63 would otherwise force Ray's aggregate output
        # blocks into the pickled-object fallback path
        return pa.table(
            {
                "h": pa.array(vc.index.to_numpy("uint64").view("int64"),
                              pa.int64()),
                "n": pa.array(vc.to_numpy("int64"), pa.int64()),
            }
        )

    agg = (
        docs_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("h").sum("n")
    )

    def dup_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["sum(n)"], min_dup))

    dup_tbl = agg.map_batches(dup_only, batch_format="pyarrow").to_pandas()
    if len(dup_tbl) > max_dup_lines:
        raise ValueError(
            f"{len(dup_tbl)} duplicated lines exceed max_dup_lines="
            f"{max_dup_lines}; raise the cap or min_dup"
        )
    dup_sorted = np.sort(dup_tbl["h"].to_numpy("int64"))
    dup_ref = ray.put(dup_sorted)

    def scrub(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        df = batch.to_pandas()
        lines = df[text_col].str.split("\n")
        ex = df[[id_col]].assign(line=lines).explode("line")
        ex = ex[ex["line"].str.len() > 0]
        h = _line_hashes(ex["line"]).view(np.int64)
        if len(dup):
            pos = np.clip(np.searchsorted(dup, h), 0, len(dup) - 1)
            is_dup = dup[pos] == h
        else:
            is_dup = np.zeros(len(h), dtype=bool)
        n_lines = ex.groupby(id_col, sort=False).size()
        kept = ex[~is_dup]
        clean = kept.groupby(id_col, sort=False)["line"].agg("\n".join)
        out = df[[id_col]].copy()
        out["clean_text"] = out[id_col].map(clean).fillna("")
        out["n_lines"] = (
            out[id_col].map(n_lines).fillna(0).astype("int64")
        )
        n_kept = kept.groupby(id_col, sort=False).size()
        out["n_dropped"] = (
            out["n_lines"]
            - out[id_col].map(n_kept).fillna(0).astype("int64")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return docs_ds.map_batches(scrub, batch_format="pyarrow")


def _scoped_key(scope_arr, line_arr, sep: str) -> "np.ndarray":
    """Exact elementwise ``scope ++ sep ++ line`` as an object array
    (Python string concat — NUL bytes preserved; numpy 'U' arrays strip
    trailing NULs and must not be used for keys here)."""
    import pandas as pd

    return pd.Series(scope_arr, dtype=object).str.cat(
        pd.Series(line_arr, dtype=object), sep=sep
    ).to_numpy(dtype=object)


def scoped_template_lines(docs_ds, *, scope_col: str = "host",
                          id_col: str = "doc_id", text_col: str = "text",
                          min_docs: int = 3, num_partitions: int = 32):
    """Per-scope duplicated-line detection — the site-template signal
    (the host-scoped variant of :func:`line_dedup`, the standard web
    pipeline's boilerplate stage: a nav bar duplicated across one
    host's pages is template; the same words on another host are not).

    A line is template for scope S iff it appears in >= ``min_docs``
    DISTINCT documents of S. One streaming pass: per-batch partial
    distinct-doc counts per (scope, line) — additive because each
    document's row lives in exactly one batch and lines are deduped
    within the document first — shuffled into bounded hash partitions
    of the (scope, line) key (never a per-key Ray aggregate; the key
    space is unbounded), folded and thresholded in-partition.

    Returns a Dataset ``(scope, line, n_docs)`` of template lines. The
    scope/line key uses ``\\x1f`` as the separator (never ``\\x00`` —
    repo NUL-safety contract) and ``np.unique`` for grouping, so NUL
    bytes inside lines are handled exactly."""
    import numpy as np
    import pandas as pd

    from ..shuffle_utils import stable_hash_array

    sep = "\x1f"

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([scope_col, id_col, text_col]).to_pandas()
        s = df[text_col].fillna("")
        lines = s.str.split("\n")
        lens = lines.str.len().to_numpy("int64")
        flat = lines.explode()
        doc_of = np.repeat(np.arange(len(df)), lens)
        keep = (flat.str.len() > 0).to_numpy(bool)
        line_arr = flat.to_numpy(dtype=object)[keep]
        doc_of = doc_of[keep]
        scope_arr = df[scope_col].to_numpy(dtype=object)[doc_of]
        # null scopes (hosts from malformed URLs are nullable) carry no
        # template group: drop their rows before the \x1f-joined key —
        # str.cat would yield NaN keys np.unique cannot sort
        if len(scope_arr):
            valid = ~pd.isna(scope_arr)
            if not valid.all():
                scope_arr = scope_arr[valid]
                line_arr = line_arr[valid]
                doc_of = doc_of[valid]
        if not len(line_arr):
            return pa.table({
                "scope": pa.array([], pa.string()),
                "line": pa.array([], pa.string()),
                "nd": pa.array([], pa.int64()),
                "pid": pa.array([], pa.int32()),
            })
        # object-dtype concat (exact, incl. NUL bytes — numpy 'U'
        # arrays strip trailing NULs)
        key = _scoped_key(scope_arr, line_arr, sep)
        u, first, inv = np.unique(key, return_index=True,
                                  return_inverse=True)
        pair = inv.astype(np.int64) * len(df) + doc_of
        upair = np.unique(pair)
        nd = np.bincount((upair // len(df)).astype(np.int64),
                         minlength=len(u)).astype(np.int64)
        pid = (stable_hash_array(u) % np.uint64(num_partitions)).astype(
            "int32")
        return pa.table({
            "scope": pa.array(scope_arr[first], pa.string()),
            "line": pa.array(line_arr[first], pa.string()),
            "nd": pa.array(nd, pa.int64()),
            "pid": pa.array(pid, pa.int32()),
        })

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        key = _scoped_key(group["scope"].to_numpy(object),
                          group["line"].to_numpy(object), sep)
        u, first, inv = np.unique(key, return_index=True,
                                  return_inverse=True)
        nd = np.bincount(inv, weights=group["nd"].to_numpy()).astype(
            np.int64)
        keep = nd >= min_docs
        first = first[keep]
        return pd.DataFrame({
            "scope": pd.Series(group["scope"].to_numpy(object)[first],
                               dtype=object),
            "line": pd.Series(group["line"].to_numpy(object)[first],
                              dtype=object),
            "n_docs": nd[keep],
        })

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(fold, batch_format="pandas")
    )


def scoped_line_dedup(docs_ds, templates_ds=None, *,
                      scope_col: str = "host", id_col: str = "doc_id",
                      text_col: str = "text", min_docs: int = 3,
                      num_partitions: int = 32,
                      max_template_lines: int = 2_000_000):
    """Scrub each document's per-scope template lines (detected by
    :func:`scoped_template_lines`, or pass a precomputed ``templates_ds``).
    The template set — bounded by the boilerplate vocabulary, capped at
    ``max_template_lines`` with a hard error — broadcasts once via
    ``ray.put`` as sorted 64-bit (scope ++ line) hashes; each batch
    probes it with vectorized ``searchsorted``. Returns
    (id, scope, clean_text, n_lines, n_dropped) and never materializes
    the corpus."""
    import numpy as np
    import pandas as pd
    import ray

    sep = "\x1f"
    if templates_ds is None:
        templates_ds = scoped_template_lines(
            docs_ds, scope_col=scope_col, id_col=id_col, text_col=text_col,
            min_docs=min_docs, num_partitions=num_partitions,
        )

    def key_hash(scope_vals, line_vals) -> np.ndarray:
        key = _scoped_key(np.asarray(scope_vals, object),
                          np.asarray(line_vals, object), sep)
        return pd.util.hash_array(key, categorize=False).view(np.int64)

    def to_hash(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64())})
        return pa.table({"h": pa.array(
            key_hash(batch["scope"].to_numpy(zero_copy_only=False),
                     batch["line"].to_numpy(zero_copy_only=False)),
            pa.int64())})

    tpl = templates_ds.map_batches(to_hash, batch_format="pyarrow") \
        .to_pandas()
    if len(tpl) > max_template_lines:
        raise ValueError(
            f"{len(tpl)} template lines exceed max_template_lines="
            f"{max_template_lines}; raise the cap or min_docs"
        )
    dup_sorted = np.sort(tpl["h"].to_numpy("int64"))
    dup_ref = ray.put(dup_sorted)

    def scrub(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        df = batch.to_pandas()
        lines = df[text_col].fillna("").str.split("\n")
        lens = lines.str.len().to_numpy("int64")
        flat = lines.explode()
        doc_of = np.repeat(np.arange(len(df)), lens)
        keep = (flat.str.len() > 0).to_numpy(bool)
        line_arr = flat.to_numpy(dtype=object)[keep]
        doc_of = doc_of[keep]
        scope_full = df[scope_col].to_numpy(dtype=object)
        is_dup = np.zeros(len(line_arr), dtype=bool)
        if len(line_arr) and len(dup):
            # null-scope docs never match a template (detection drops
            # them); probe only the rows with a real scope key
            scope_rows = scope_full[doc_of]
            valid = ~pd.isna(scope_rows)
            if valid.any():
                h = key_hash(scope_rows[valid], line_arr[valid])
                pos = np.clip(np.searchsorted(dup, h), 0, len(dup) - 1)
                is_dup[valid] = dup[pos] == h
        n_lines = np.bincount(doc_of, minlength=len(df)).astype(np.int64)
        kept_doc = doc_of[~is_dup]
        joined = pd.Series(line_arr[~is_dup]).groupby(
            kept_doc, sort=False
        ).agg("\n".join)
        clean = pd.Series([""] * len(df))
        clean.update(joined)
        n_kept = np.bincount(kept_doc, minlength=len(df)).astype(np.int64)
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy("int64"), pa.int64()),
            "scope": pa.array(scope_full, pa.string()),
            "clean_text": pa.array(clean.tolist(), pa.string()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_dropped": pa.array(n_lines - n_kept, pa.int64()),
        })

    return docs_ds.map_batches(scrub, batch_format="pyarrow")


def doc_stats(docs_ds):
    return docs_ds.map_batches(doc_stats_batch, batch_format="pyarrow")


def quality_scores(docs_ds):
    return docs_ds.map_batches(quality_score_batch, batch_format="pyarrow")


def fingerprints(docs_ds):
    return docs_ds.map_batches(fingerprint_batch, batch_format="pyarrow")


_LANG_ID: LangId | None = None


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Task-mode LangId: profiles memoized once per worker process."""
    global _LANG_ID
    if _LANG_ID is None:
        _LANG_ID = LangId()
    return _LANG_ID(batch)


def lang_id(docs_ds, concurrency=None):
    """Language-ID over documents. ``concurrency`` switches to a
    dedicated actor pool — worth it only when the model state is heavy
    (here the profiles are tiny, so the default shared-pool task mode
    avoids per-call actor spawn)."""
    if concurrency is not None:
        return docs_ds.map_batches(
            LangId, batch_format="pyarrow", batch_size=4096,
            concurrency=concurrency,
        )
    return docs_ds.map_batches(
        lang_id_batch, batch_format="pyarrow", batch_size=4096
    )


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style within-document repetition signals (the filters the
    Gopher/MassiveText and RefinedWeb cleaning recipes apply before
    training): token totals and distincts plus the most frequent token
    and adjacent-token bigram per document. All outputs are integers or
    strings so the DuckDB oracle comparison is exact; ties break
    deterministically (highest count, then lexicographically smallest).
    Fully per-document, so the stage is an embarrassingly parallel
    ``map_batches`` — no shuffle at any scale. The explode/groupby work
    is pandas C kernels; the only Python-level step is the initial
    regex split (RE2, matching the oracle's ``\\S+``)."""
    import numpy as np
    import pandas as pd

    toks_list = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
    flat = pc.list_flatten(toks_list)
    parent = pc.list_parent_indices(toks_list)
    df = pd.DataFrame(
        {"i": parent.to_numpy(zero_copy_only=False),
         "tok": flat.to_pandas()}
    )
    df = df[df["tok"] != ""].reset_index(drop=True)
    # adjacent-token bigrams: shift(-1) within each document
    df["nxt"] = df.groupby("i")["tok"].shift(-1)

    base = df.groupby("i").agg(n_tokens=("tok", "size"))
    # distinct per doc via the NUL-safe dedup, not agg("nunique"):
    # nunique collapses NUL-twin tokens (truncating-hashtable family);
    # "i" is an integer key, so the follow-up groupby is safe
    from ..shuffle_utils import drop_duplicates_nul_safe

    base["n_distinct_tokens"] = (
        drop_duplicates_nul_safe(df[["i", "tok"]])
        .groupby("i").size().reindex(base.index, fill_value=0)
    )

    def _top(frame: pd.DataFrame, col: str) -> pd.DataFrame:
        # group on (int doc, int token code), never on the object token:
        # pandas multi-key groupby factorizes object keys through the
        # NUL-truncating C-string table (CLAUDE.md contract); np.unique
        # codes are exact
        vals = frame[col].to_numpy(dtype=object)
        uniq, codes = np.unique(vals, return_inverse=True)
        cnt = pd.DataFrame(
            {"i": frame["i"].to_numpy(), "code": codes}
        ).groupby(["i", "code"]).size().reset_index(name="c")
        cnt[col] = uniq[cnt["code"].to_numpy()]
        # (i, col) pairs are unique, so the 3-column sort key is a total
        # order — deterministic winner without relying on sort stability
        cnt = sort_values_nul_safe(cnt[["i", col, "c"]], ["i", "c", col],
                                   ascending=[True, False, True])
        return cnt.drop_duplicates("i").set_index("i")

    tt = _top(df, "tok")
    bg = df.dropna(subset=["nxt"]).copy()
    bg["bg"] = bg["tok"] + " " + bg["nxt"]
    tb = _top(bg, "bg") if len(bg) else pd.DataFrame(
        columns=["bg", "c"], index=pd.Index([], name="i")
    )

    out = pd.DataFrame({"doc_id": batch["doc_id"].to_pandas()})
    out = out.join(base, how="left").join(
        tt.rename(columns={"tok": "top_token", "c": "top_token_count"}),
        how="left",
    ).join(
        tb.rename(columns={"bg": "top_bigram", "c": "top_bigram_count"}),
        how="left",
    )
    for c in ("n_tokens", "n_distinct_tokens", "top_token_count",
              "top_bigram_count"):
        out[c] = out[c].fillna(0).astype("int64")
    for c in ("top_token", "top_bigram"):
        out[c] = out[c].astype(object).where(out[c].notna(), None)
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------------ PII redaction -------
# RE2-safe patterns (no backreferences/lookaround) so pyarrow and DuckDB
# agree byte-for-byte. Order matters: EMAIL before PHONE so the digits of
# an already-redacted token are never re-matched; each pattern is applied
# with global non-overlapping left-to-right replacement in BOTH engines.
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("SSN", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("PHONE", r"\+?\b[0-9][0-9()\s.-]{7,}[0-9]\b"),
)


def pii_redact_batch(batch: pa.Table,
                     patterns=PII_PATTERNS) -> pa.Table:
    """Redact PII spans in ``text``: each match of a pattern class is
    replaced by its ``[CLASS]`` placeholder, and per-class match counts
    are emitted alongside (vectorized ``replace_substring_regex`` /
    ``count_substring_regex`` per class — bounded pattern count, no
    Python row loop). Mirrors the scrubbing stage every training-data
    pipeline runs before tokenization (C4/RefinedWeb-style)."""
    text = batch["text"]
    cols = {"doc_id": batch["doc_id"]}
    counts = {}
    for name, pat in patterns:
        counts[f"n_{name.lower()}"] = pc.count_substring_regex(
            text, pat
        ).cast(pa.int64())
        text = pc.replace_substring_regex(text, pat, f"[{name}]")
    cols["clean_text"] = text
    cols.update(counts)
    return pa.table(cols)


def pii_redact(docs_ds):
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        pii_redact_batch, batch_format="pyarrow"
    )


def _window_hashes(tok_hash: "np.ndarray", starts: "np.ndarray",
                   lens: "np.ndarray", window: int) -> "np.ndarray":
    """Rolling W-token window hashes for a batch of documents whose
    token hashes are concatenated in ``tok_hash`` (per-doc segments at
    ``starts``/``lens``): a vectorized polynomial fold of W shifted
    views (W numpy ops over the whole batch, no Python per-token loop).
    Windows that would cross a document boundary are masked out by the
    caller via the returned per-position validity."""
    import numpy as np

    n = len(tok_hash)
    if n < window:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    P = np.uint64(1099511628211)  # FNV prime: odd -> invertible mod 2^64
    acc = np.zeros(n - window + 1, np.uint64)
    for k in range(window):
        acc = acc * P + tok_hash[k:n - window + 1 + k]
    # a window starting at i is valid iff it lies inside one doc
    doc_of = np.repeat(np.arange(len(lens)), lens)
    valid = doc_of[: n - window + 1] == doc_of[window - 1:]
    return acc[valid], np.flatnonzero(valid)


def span_dedup(docs_ds, *, window: int = 20, min_dup: int = 2,
               id_col: str = "doc_id", text_col: str = "text",
               max_dup_windows: int = 2_000_000):
    """Corpus-level duplicated-span detection and removal — the
    scalable approximation of ExactSubstr dedup (Lee et al., 2022,
    "Deduplicating Training Data Makes Language Models Better"): any
    run of ``window`` consecutive tokens whose rolling hash occurs
    >= ``min_dup`` times across the corpus marks every token it covers;
    covered tokens are removed from the cleaned text.

    Same two-pass shape as :func:`line_dedup` (the suffix array of the
    paper is replaced by fixed-width window hashing, which shuffles
    DISTINCT window hashes only and needs no global sort): (1)
    streaming partial window-hash counts -> keyed sum -> duplicated
    set, bounded by ``max_dup_windows`` with a hard error; (2) the set
    broadcast once via ``ray.put``, each document re-scanned
    vectorized, covered tokens dropped. Returns
    (id, clean_text, n_tokens, n_dup_windows, n_covered_tokens)."""
    import numpy as np
    import pandas as pd
    import ray

    def _doc_token_arrays(texts: "pd.Series"):
        toks = texts.fillna("").str.split()
        lens = toks.str.len().fillna(0).to_numpy("int64")
        flat = toks.explode().dropna()
        th = pd.util.hash_pandas_object(flat, index=False,
                                        categorize=False).to_numpy(
            "uint64"
        )
        starts = np.zeros(len(lens), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        return th, starts, lens

    def partial_counts(batch: pa.Table) -> pa.Table:
        th, starts, lens = _doc_token_arrays(batch[text_col].to_pandas())
        wh, _ = _window_hashes(th, starts, lens, window)
        vals, counts = np.unique(wh, return_counts=True)
        # int64 view: see line_dedup — avoids Ray's pickled-block
        # fallback on aggregate outputs holding values past 2^63
        return pa.table(
            {"h": pa.array(vals.view(np.int64), pa.int64()),
             "n": pa.array(counts.astype("int64"), pa.int64())}
        )

    agg = (
        docs_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("h").sum("n")
    )

    def dup_only(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64())})
        keep = pc.greater_equal(batch["sum(n)"], min_dup)
        return pa.table({"h": batch.filter(keep)["h"]})

    dup_tbl = agg.map_batches(dup_only, batch_format="pyarrow").to_pandas()
    if len(dup_tbl) > max_dup_windows:
        raise ValueError(
            f"{len(dup_tbl)} duplicated windows exceed max_dup_windows="
            f"{max_dup_windows}; raise the cap or min_dup"
        )
    dup_sorted = np.sort(dup_tbl["h"].to_numpy("int64")) if len(dup_tbl) \
        else np.empty(0, np.int64)
    dup_ref = ray.put(dup_sorted)

    def scrub(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        df = batch.to_pandas()
        texts = df[text_col]
        th, starts, lens = _doc_token_arrays(texts)
        n = len(th)
        covered = np.zeros(n, bool)
        n_dup_win = np.zeros(len(df), np.int64)
        if n >= window and len(dup):
            wh, pos = _window_hashes(th, starts, lens, window)
            wh = wh.view(np.int64)
            loc = np.clip(np.searchsorted(dup, wh), 0, len(dup) - 1)
            hit = dup[loc] == wh
            hit_pos = pos[hit]
            # mark the W tokens under each duplicated window via a
            # difference array (vectorized interval painting)
            diff = np.zeros(n + 1, np.int64)
            np.add.at(diff, hit_pos, 1)
            np.add.at(diff, hit_pos + window, -1)
            covered = np.cumsum(diff[:-1]) > 0
            doc_of = np.repeat(np.arange(len(lens)), lens)
            np.add.at(n_dup_win, doc_of[hit_pos], 1)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        n_cov = np.bincount(
            doc_of[covered], minlength=len(df)
        ).astype("int64") if n else np.zeros(len(df), np.int64)
        flat = texts.fillna("").str.split().explode().dropna()
        kept = flat[~covered] if n else flat
        kept_doc = doc_of[~covered] if n else np.empty(0, np.int64)
        joined = pd.Series(kept.to_numpy(dtype=object)).groupby(
            kept_doc, sort=False
        ).agg(" ".join)
        clean = pd.Series([""] * len(df))
        clean.update(joined)
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy("int64"), pa.int64()),
                "clean_text": pa.array(clean.tolist(), pa.string()),
                "n_tokens": pa.array(lens, pa.int64()),
                "n_dup_windows": pa.array(n_dup_win, pa.int64()),
                "n_covered_tokens": pa.array(n_cov, pa.int64()),
            }
        )

    return docs_ds.map_batches(scrub, batch_format="pyarrow")


# ------------------------------------------------------------ Bloom filter --
def _ngram_strings(texts: "pd.Series", ngram: int):
    """Vectorized per-document token n-grams: one flat string array of
    space-joined n-grams plus each n-gram's document ordinal. Documents
    shorter than ``ngram`` tokens contribute none."""
    import numpy as np
    import pandas as pd

    toks = texts.fillna("").str.findall(TOKEN_PATTERN)
    lens = toks.str.len().to_numpy("int64")
    ex = toks.explode()
    flat = ex[ex.notna()].to_numpy(dtype=object)
    doc_of = np.repeat(np.arange(len(lens)), lens)
    n = len(flat)
    if n < ngram:
        return np.empty(0, object), np.empty(0, np.int64)
    # valid n-gram starts = positions whose whole window stays in-doc
    ok = doc_of[: n - ngram + 1] == doc_of[ngram - 1:]
    grams = pd.Series(flat[: n - ngram + 1])
    for i in range(1, ngram):
        grams = grams + " " + pd.Series(flat[i: n - ngram + 1 + i])
    return grams.to_numpy(dtype=object)[ok], doc_of[: n - ngram + 1][ok]


def _bloom_positions(grams, n_bits: int, n_hashes: int):
    """(n_hashes, n) bit positions via double hashing over two stable
    64-bit hashes (same construction as the Count-Min sketch above)."""
    import numpy as np
    import pandas as pd

    s = pd.Series(grams, dtype=str)
    h1 = pd.util.hash_pandas_object(s, index=False,
                                    categorize=False).to_numpy("uint64")
    h2 = pd.util.hash_pandas_object(s + "\x1fbloom", index=False,
                                    categorize=False).to_numpy("uint64")
    return np.stack(
        [((h1 + np.uint64(d) * h2) % np.uint64(n_bits)).astype(np.int64)
         for d in range(n_hashes)]
    )


def bloom_build(ds, *, text_col: str = "text", ngram: int = 3,
                n_bits: int = 1 << 20, n_hashes: int = 4) -> bytes:
    """Build a Bloom filter over every token ``ngram`` of ``text_col``
    — the mergeable MEMBERSHIP sketch beside HLL (distinct), Count-Min
    (frequency) and the quantile sample: each batch emits ONE packed
    ``n_bits/8``-byte bitmap partial, and the driver ORs them — a
    tree-reduce of fixed-size opaque blobs, never an element shuffle,
    so the build cost is independent of element cardinality. Returns
    the packed little-endian bitmap."""
    import numpy as np

    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        grams, _ = _ngram_strings(batch[text_col].to_pandas(), ngram)
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        if len(grams):
            # np.unique, not pd.unique: pandas' object hash table
            # truncates at NUL bytes (distinct n-grams would collapse
            # and some bits never get set -> FALSE NEGATIVES)
            pos = _bloom_positions(np.unique(grams), n_bits, n_hashes)
            flat = pos.ravel()
            np.bitwise_or.at(
                bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8)
            )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    folded = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in ds.map_batches(
        partial, batch_format="pyarrow"
    ).iter_rows():
        folded |= np.frombuffer(row["bits"], dtype=np.uint8)
    return folded.tobytes()


def bloom_probe(docs_ds, bloom: bytes, *, id_col: str = "doc_id",
                text_col: str = "text", ngram: int = 3,
                n_bits: int = 1 << 20, n_hashes: int = 4):
    """Probe every document's token n-grams against a built Bloom
    filter → (id, n_ngrams, n_hits, flagged). The filter is broadcast
    ONCE via ``ray.put`` and read per batch; membership tests are
    vectorized bit loads. No false negatives (every true member hits);
    false positives bounded by the standard (1-e^{-kn/m})^k rate, so
    ``flagged`` over-approximates — callers needing exactness re-verify
    flagged docs against the source set (bounded by the hit count)."""
    import numpy as np
    import ray

    bloom_ref = ray.put(np.frombuffer(bloom, dtype=np.uint8))

    def probe(batch: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        grams, doc_of = _ngram_strings(batch[text_col].to_pandas(), ngram)
        nd = batch.num_rows
        n_ngrams = np.bincount(doc_of, minlength=nd).astype("int64")
        if len(grams):
            pos = _bloom_positions(grams, n_bits, n_hashes)
            member = np.ones(len(grams), dtype=bool)
            for d in range(n_hashes):
                member &= (bits[pos[d] >> 3] >> (pos[d] & 7)) & 1 == 1
            n_hits = np.bincount(
                doc_of[member], minlength=nd
            ).astype("int64")
        else:
            n_hits = np.zeros(nd, dtype=np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_ngrams": pa.array(n_ngrams, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "flagged": pa.array(n_hits > 0),
            }
        )

    return docs_ds.map_batches(probe, batch_format="pyarrow")
