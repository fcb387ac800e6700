"""robots.txt crawl-politeness filtering (RFC 9309) — the step between
link extraction (:mod:`.weblinks`) and the crawl frontier: which
discovered URLs may actually be fetched.

Shapes for scale the way every small-side lookup in this repo is:
robots.txt documents are a HOST-cardinality corpus (one tiny text per
host — millions of hosts, bytes each), so the compiled rule index
broadcasts once via ``ray.put`` and every frontier batch consults it
in-task; the frontier itself (page cardinality) streams and is never
shuffled by this stage.

Semantics (RFC 9309):

- group selection: the longest user-agent token that is a
  case-insensitive substring-token match wins; ``*`` is the fallback.
- rule matching: the LONGEST matching pattern wins across Allow and
  Disallow together; on equal length Allow wins. ``*`` matches any
  run (including ``/``), ``$`` anchors the end. No matching rule (or
  no robots.txt for the host) = allowed.
- patterns match the URL's path + ``?query`` (the reference frame
  every crawler uses); matching is byte-wise on the raw path.

Matching is vectorized per (host, rule): frontier URLs group by host
with dictionary codes, each host's few rules run as Arrow regex
kernels over that host's slice — Python cost is per distinct host per
batch, never per URL.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _pattern_to_regex(pattern: str) -> str:
    """robots path pattern → RE2 (anchored at path start; ``*`` → any
    run, trailing ``$`` → end anchor)."""
    anchor_end = pattern.endswith("$")
    if anchor_end:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchor_end else "")


def parse_robots(text: str, agent: str = "*") -> list:
    """One robots.txt → the selected group's rules as
    ``[(pattern, allow: bool, specificity: int)]`` (RFC 9309 group
    selection: longest matching user-agent token; ``*`` fallback)."""
    agent = agent.lower()
    groups: list = []  # (agents, rules)
    cur_agents: list = []
    cur_rules: list = []
    open_group = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if open_group:  # a rule closed the previous group
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, open_group = [], [], False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            open_group = True
            if val:
                cur_rules.append((val, key == "allow", len(val)))
            elif key == "disallow":
                pass  # empty Disallow = allow all (no rule)
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    best_len, best_rules = -1, []
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if best_len < 0:
                    best_rules = rules
            elif a in agent and len(a) > best_len:
                best_len, best_rules = len(a), rules
    return best_rules


def compile_rules(robots: dict, agent: str = "*") -> dict:
    """{host: robots.txt text} → {host: [(regex, allow, specificity)]}
    — the broadcast side (host cardinality, bytes per host)."""
    out = {}
    for host, text in robots.items():
        rules = [(_pattern_to_regex(p), allow, spec)
                 for p, allow, spec in parse_robots(text, agent)]
        if rules:
            # hostnames are case-insensitive (RFC 4343): key the index
            # lowercase so a mixed-case frontier URL can't bypass rules
            out[host.lower()] = rules
    return out


def allowed_mask(urls, rules: dict) -> np.ndarray:
    """Frontier URL column → bool mask under the compiled rule index.
    Vectorized per (distinct host in batch, rule)."""
    from .weburl import parse_urls

    p = parse_urls(urls)
    # lowercase to match the rule index — a fail-open politeness filter
    # must not be bypassable by host case (RFC 4343)
    host = pc.utf8_lower(pc.fill_null(p["host"], ""))
    path = pc.binary_join_element_wise(
        pc.if_else(pc.equal(pc.fill_null(p["path"], ""), ""), "/",
                   pc.fill_null(p["path"], "")),
        pc.if_else(pc.equal(pc.fill_null(p["query"], ""), ""), "",
                   pc.binary_join_element_wise(
                       "?", pc.fill_null(p["query"], ""), "")),
        "")
    enc = pc.dictionary_encode(host.combine_chunks())
    codes = enc.indices.to_numpy(zero_copy_only=False)
    n = len(codes)
    allow = np.ones(n, dtype=bool)
    for code, h in enumerate(enc.dictionary.to_pylist()):
        host_rules = rules.get(h)
        if not host_rules:
            continue
        idx = np.flatnonzero(codes == code)
        sub = path.take(pa.array(idx))
        best_spec = np.full(len(idx), -1, dtype=np.int64)
        best_allow = np.ones(len(idx), dtype=bool)
        for regex, is_allow, spec in host_rules:
            m = pc.match_substring_regex(sub, regex).to_numpy(
                zero_copy_only=False)
            # longest match wins; equal length → Allow wins
            upd = m & ((spec > best_spec)
                       | ((spec == best_spec) & is_allow))
            best_spec[upd] = spec
            best_allow[upd] = is_allow
        allow[idx] = best_allow
    return allow


def schedule_frontier(frontier_ds, *, url_col: str = "resolved",
                      per_host_delay_s: int = 1,
                      num_partitions: int = 32):
    """Frontier URLs → deterministic polite fetch schedule
    ``(url, host, slot, fetch_offset_s)``: within each host, URLs take
    slots in canonical-sort order and fetch ``slot × per_host_delay_s``
    seconds after the host's crawl start — one request per host per
    delay window, hosts in parallel (the standard politeness model).

    Scale shape: hosts hash into bounded partitions (a host never
    splits), ranking inside is one vectorized dictionary-encode +
    argsort per partition — no global sort, no driver state; total
    order is deterministic under any batch/partition arrival order."""
    import pandas as pd

    from ..shuffle_utils import add_partition_id
    from .weburl import parse_urls

    def keyed(batch: pa.Table) -> pa.Table:
        host = pc.fill_null(parse_urls(batch[url_col])["host"], "")
        t = pa.table({"url": batch[url_col], "host": host}).filter(
            pc.not_equal(host, ""))
        return add_partition_id(t, "host", num_partitions, col="pid")

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=["url"])  # single-col: NUL-safe
        order = np.lexsort((df["url"].to_numpy(object),
                            df["host"].to_numpy(object)))
        df = df.iloc[order].reset_index(drop=True)
        hosts = df["host"].to_numpy(object)
        # slot = rank within the (contiguous after sort) host run
        starts = np.flatnonzero(
            np.r_[True, hosts[1:] != hosts[:-1]])
        slot = np.arange(len(df)) - np.repeat(
            starts, np.diff(np.r_[starts, len(df)]))
        return pd.DataFrame({
            "url": df["url"],
            "host": df["host"],
            "slot": slot.astype("int64"),
            "fetch_offset_s": (slot * per_host_delay_s).astype("int64"),
        })

    return (frontier_ds.map_batches(keyed, batch_format="pyarrow")
            .groupby("pid").map_groups(rank, batch_format="pandas"))


def frontier_filter_batch(batch: pa.Table, rules: dict, *,
                          url_col: str = "resolved",
                          out_col: str = "crawl_allowed") -> pa.Table:
    """``map_batches`` form: adds a ``crawl_allowed`` bool column.
    Pass ``rules`` through ``ray.put`` + a closure (broadcast once),
    not per batch."""
    mask = allowed_mask(batch[url_col], rules)
    out = batch
    if out_col in out.column_names:
        out = out.drop_columns([out_col])
    return out.append_column(out_col, pa.array(mask))
