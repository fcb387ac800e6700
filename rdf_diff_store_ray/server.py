"""HTTP wire surface mirroring the reference's two actix binaries.

The reference ships as HTTP services: a read server (``rdf-query-cache``
— GET ``/api/graphs/{timestamp}``, ``/api/sparql/{timestamp}``,
``/api/metadata``, ``/metrics``, ``/livez``, ``/readyz``;
``src/bin/rdf-query-cache.rs:48-124``) and a write server
(``rdf-diff-writer`` — ``POST /api/graphs`` with the JSON Graph model,
``DELETE /api/graphs?id=``, API-key-gated; ``src/bin/rdf-diff-writer.rs:
45-96``, ``src/models/graph.rs:14-22``, ``openapi.yaml``). This module
serves both route sets over one delta-log store so a reference client
can switch endpoints without changing its requests; ``read_only=True``
reproduces the query-cache role exactly (writes 404).

Semantics mirrored from the reference, not its code:

- reads are unauthenticated (the reference's ``validate_api_key`` calls
  on GET handlers are commented out, ``rdf-query-cache.rs:56,88``);
  writes require ``X-API-KEY`` when the server holds a key
  (``rdf-diff-writer.rs:52,84``; 401 on mismatch, ``api.rs:25-39``).
- ``GET /api/graphs/{ts}`` returns the merged store as ``text/turtle``
  with a ``Cache-Level`` response header
  (``metrics/middleware.rs:12``); ``?id=`` narrows to one graph.
  Canonical N-Triples is valid Turtle; configure ``prefixes`` to get
  prefix-compacted output like the reference's prettifier.
- ``GET /api/sparql/{ts}?query=`` returns SPARQL-results JSON +
  ``Cache-Level``.
- errors use the reference's JSON error model ``{"message", "error"}``
  (``openapi.yaml`` Error schema).
- writes serialize through the store's single-writer lock
  (:class:`..state.append.StoreWriteLock` inside ``append_graphs``),
  the pool-of-one the reference uses for atomicity
  (``rdf-diff-writer.rs:25-31``). POST bodies may carry an optional
  ``"timestamp"`` (unix seconds) — an extension for deterministic
  clients; absent, the server clock is used (the reference commits at
  wall-clock time too, ``src/git.rs:151-161``).

This is an application entry point like the CLI: it owns no Ray session
(appends auto-init Ray Data when standalone) and the injectable
``now_fn`` keeps wall-clock out of everything testable.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def _bounds_json(lo, hi) -> dict:
    """Serialize store time bounds the way the reference's Option fields
    do: an empty just-initialized store has no versions, so both bounds
    are JSON null (pd.Timestamp(None) is NaT and would raise on
    ``.timestamp()``)."""
    import pandas as pd

    def to_s(v):
        if v is None or pd.isna(v):
            return None
        return int(pd.Timestamp(v).timestamp())

    return {"start_time": to_s(lo), "end_time": to_s(hi)}


class StoreBackend:
    """Shared state behind the handlers: a lazily (re)loaded reader over
    the delta log, invalidated after every successful write."""

    def __init__(self, delta_dir: str, *, prefixes: dict | None = None,
                 services: dict | None = None):
        self.delta_dir = delta_dir
        self.prefixes = prefixes
        # iri → store dir path (loaded in-process) or http(s) URL of
        # another live server (wire federation, passed to the reader)
        self.services = dict(services or {})
        self._lock = threading.Lock()
        self._reader = None

    def invalidate(self) -> None:
        with self._lock:
            self._reader = None

    def close(self) -> None:
        pass

    def reader(self):
        from .query.bgp import DiffStoreReader

        with self._lock:
            if self._reader is None:
                svc = {
                    iri: (path if path.startswith(("http://", "https://"))
                          else DiffStoreReader(self._load(path)))
                    for iri, path in self.services.items()
                }
                self._reader = DiffStoreReader(
                    self._load(self.delta_dir), services=svc)
            return self._reader

    def _load(self, delta_dir: str | None = None):
        import glob
        import os

        import pyarrow.dataset as pads

        d = delta_dir or self.delta_dir
        files = sorted(
            glob.glob(os.path.join(d, "partition=*", "*.parquet"))
        )
        if not files:
            raise FileNotFoundError(f"no delta partitions under {d!r}")
        return pads.dataset(files).to_table()

    # ------------------------------------------------------------- reads
    def graphs_at(self, ts: int, graph_id: str | None) -> tuple[str, str]:
        """(document, cache_level). Merged store, or one graph when
        ``graph_id`` is given (absent graph → empty document, matching
        the reference's empty-result behavior for unknown ids)."""
        reader = self.reader()
        if graph_id is None:
            text = reader.graphs_at(ts)
            level = reader.last_cache_level
        else:
            import pyarrow.compute as pc

            from .state.reconstruct import state_at_table

            live = state_at_table(reader.deltas, ts)
            hit = live.filter(pc.equal(live["graph_id"], graph_id))
            text = hit["delta_text"][0].as_py() if hit.num_rows else ""
            level = "Graph" if hit.num_rows else "Nothing"
        if self.prefixes is not None and text:
            from .ntriples import parse
            from .turtle import serialize_turtle

            text = serialize_turtle(parse(text), self.prefixes)
        return text, level

    def sparql_at(self, ts: int, query: str,
                  fmt: str = "json") -> tuple[str, str]:
        reader = self.reader()
        if fmt == "tagged":  # engine-to-engine federation wire
            return reader.query_at_tagged_wire(ts, query), "Store"
        fn = {"json": reader.query_at_json, "csv": reader.query_at_csv,
              "tsv": reader.query_at_tsv}[fmt]
        return fn(ts, query), reader.last_cache_level

    def metadata(self) -> dict:
        return _bounds_json(*self.reader().metadata())

    # ------------------------------------------------------------ writes
    def store_graph(self, graph: dict, ts: int) -> int:
        return self.store_graphs([graph], ts)

    def store_graphs(self, graphs: list, ts: int) -> int:
        """One atomic multi-graph commit (append_graphs pre-validates
        all-or-nothing under the writer lock)."""
        from .state.append import Graph, append_graphs

        batch = {
            g["id"]: Graph(id=g["id"], graph=g["graph"],
                           format=g.get("format"))
            for g in graphs
        }
        n = append_graphs(self.delta_dir, batch, ts)
        self.invalidate()
        return n

    def delete_graph(self, graph_id: str, ts: int) -> int:
        from .state.append import delete_graphs

        n = delete_graphs(self.delta_dir, [graph_id], ts)
        self.invalidate()
        return n


class DistributedStoreBackend(StoreBackend):
    """Same handler contract served by :class:`..query.service.
    QueryService` — one partition-reader actor per delta partition, so
    the HTTP process never holds the store (the 100× role split: this
    process is the reference's thin actix layer, the actors are its
    repo pool of 32 readers, ``src/bin/rdf-query-cache.rs:137,170``).
    Point reads prune to the owning actor; writes invalidate by
    restarting the actor pool (the next read reloads the log, the
    fetch-updates analog)."""

    def __init__(self, delta_dir: str, *, prefixes: dict | None = None,
                 services: dict | None = None):
        super().__init__(delta_dir, prefixes=prefixes, services=services)
        self._svc = None

    def _service(self):
        from .query.service import QueryService

        with self._lock:
            if self._svc is None:
                self._svc = QueryService(self.delta_dir,
                                         services=dict(self.services))
            return self._svc

    def invalidate(self) -> None:
        with self._lock:
            if self._svc is not None:
                self._svc.shutdown()
                self._svc = None

    def close(self) -> None:
        self.invalidate()

    def _level(self, svc) -> str:
        levels = set(svc.cache_levels())
        # the most informative level any partition reached this request
        for lv in ("Prettified", "Query", "Graph", "Store"):
            if lv in levels:
                return lv
        return "Nothing"

    def graphs_at(self, ts: int, graph_id: str | None) -> tuple[str, str]:
        svc = self._service()
        if graph_id is None:
            text = svc.graphs_at(ts)
            level = self._level(svc)
        else:
            text = svc.graph_at(graph_id, ts) or ""
            level = "Graph" if text else "Nothing"
        if self.prefixes is not None and text:
            from .ntriples import parse
            from .turtle import serialize_turtle

            text = serialize_turtle(parse(text), self.prefixes)
        return text, level

    def sparql_at(self, ts: int, query: str,
                  fmt: str = "json") -> tuple[str, str]:
        svc = self._service()
        if fmt == "tagged":  # engine-to-engine federation wire
            return svc.query_at_tagged_wire(ts, query), self._level(svc)
        fn = {"json": svc.query_at_json, "csv": svc.query_at_csv,
              "tsv": svc.query_at_tsv}[fmt]
        return fn(ts, query), self._level(svc)

    def metadata(self) -> dict:
        return _bounds_json(*self._service().metadata())


def _make_handler(backend: StoreBackend, api_key: str | None,
                  read_only: bool, now_fn):
    class Handler(BaseHTTPRequestHandler):
        server_version = "rdf-diff-store-ray"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        # ------------------------------------------------------ plumbing
        def _send(self, code: int, body: str, ctype: str,
                  headers: dict | None = None) -> None:
            raw = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(raw)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(raw)

        def _error(self, code: int, message: str, error: str = "") -> None:
            self._send(code, json.dumps(
                {"message": message, "error": error}), "application/json")

        def _check_key(self) -> bool:
            if api_key is None:
                return True
            token = self.headers.get("X-API-KEY")
            if token is None:
                self._error(401, "X-API-KEY header missing")
                return False
            if token != api_key:
                self._error(401, "incorrect api key")
                return False
            return True

        def _metrics_record(self, endpoint: str, level: str) -> None:
            from .metrics import REGISTRY

            REGISTRY.counter_inc(
                "http_requests",
                f'endpoint="{endpoint}",cache_level="{level}"',
            )

        def _sparql_now(self, query: str) -> None:
            # empty store → no latest version; query at t=0 so standard
            # clients get an empty result set instead of a 500
            ts = backend.metadata()["end_time"] or 0
            accept = self.headers.get("Accept", "")
            fmt, ctype = "json", "application/json"
            if "application/x-kg-tagged-tsv" in accept:
                fmt = "tagged"
                ctype = "application/x-kg-tagged-tsv"
            elif "text/csv" in accept:
                fmt, ctype = "csv", "text/csv"
            elif "text/tab-separated-values" in accept:
                fmt, ctype = "tsv", "text/tab-separated-values"
            body, level = backend.sparql_at(ts, query, fmt=fmt)
            self._metrics_record("sparql", level)
            self._send(200, body, ctype, {"Cache-Level": level})

        # ------------------------------------------------------- routes
        def do_GET(self):  # noqa: N802 (stdlib casing)
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            q = parse_qs(url.query)
            try:
                if url.path in ("/livez", "/readyz"):
                    self._send(200, "ok", "text/plain")
                elif url.path == "/metrics":
                    from .metrics import REGISTRY

                    self._send(200, REGISTRY.render_prometheus(),
                               "text/plain; version=0.0.4")
                elif len(parts) == 3 and parts[:2] == ["api", "graphs"]:
                    ts = int(parts[2])
                    gid = q.get("id", [None])[0]
                    text, level = backend.graphs_at(ts, gid)
                    self._metrics_record("graphs", level)
                    self._send(200, text, "text/turtle",
                               {"Cache-Level": level})
                elif len(parts) == 3 and parts[:2] == ["api", "sparql"]:
                    if "query" not in q:
                        return self._error(400, "missing query parameter")
                    ts = int(parts[2])
                    # content negotiation over the W3C result formats
                    # (the reference serves JSON only; CSV/TSV are the
                    # SPARQL 1.1 standard siblings)
                    accept = self.headers.get("Accept", "")
                    fmt, ctype = "json", "application/json"
                    if "application/x-kg-tagged-tsv" in accept:
                        # engine-to-engine federation wire (exact tags)
                        fmt = "tagged"
                        ctype = "application/x-kg-tagged-tsv"
                    elif "text/csv" in accept:
                        fmt, ctype = "csv", "text/csv"
                    elif "text/tab-separated-values" in accept:
                        fmt, ctype = "tsv", "text/tab-separated-values"
                    body, level = backend.sparql_at(ts, q["query"][0],
                                                    fmt=fmt)
                    self._metrics_record("sparql", level)
                    self._send(200, body, ctype, {"Cache-Level": level})
                elif url.path == "/api/metadata":
                    self._send(200, json.dumps(backend.metadata()),
                               "application/json")
                elif url.path == "/sparql":
                    # W3C SPARQL-protocol endpoint: GET ?query= against
                    # the store's LATEST state (the time-travel form
                    # stays at /api/sparql/{ts}); standard clients need
                    # no timestamp concept
                    if "query" not in q:
                        return self._error(400, "missing query parameter")
                    self._sparql_now(q["query"][0])
                else:
                    self._error(404, f"no such endpoint: {url.path}")
            except ValueError as e:
                self._error(400, str(e))
            except Exception as e:  # reference maps internal errors to 500
                self._error(500, str(e), type(e).__name__)

        def do_POST(self):  # noqa: N802
            path = self.path.split("?")[0]
            if path == "/sparql":
                # W3C SPARQL protocol: POST with an
                # application/sparql-query body (or form-encoded query=)
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    raw = self.rfile.read(n).decode()
                    ctype = self.headers.get("Content-Type", "")
                    if "application/x-www-form-urlencoded" in ctype:
                        form = parse_qs(raw)
                        if "query" not in form:
                            return self._error(400, "missing query field")
                        raw = form["query"][0]
                    if not raw.strip():
                        return self._error(400, "empty query body")
                    return self._sparql_now(raw)
                except ValueError as e:
                    return self._error(400, str(e))
                except Exception as e:
                    return self._error(500, str(e), type(e).__name__)
            if path != "/api/graphs" or read_only:
                return self._error(404, "no such endpoint")
            if not self._check_key():
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n).decode())
                # a JSON list batches several Graph models in one commit
                graphs = payload if isinstance(payload, list) else [payload]
                if not graphs or not all(
                    isinstance(g, dict) and not ({"id", "graph"} - set(g))
                    for g in graphs
                ):
                    return self._error(400, "Graph model needs id + graph")
                # a batch is ONE atomic commit at ONE instant — members
                # carrying differing explicit timestamps would be
                # silently re-stamped, so reject instead
                stamps = {
                    int(g["timestamp"]) for g in graphs
                    if g.get("timestamp") is not None
                }
                if len(stamps) > 1:
                    return self._error(
                        400,
                        "batch graphs carry differing timestamps; a "
                        "batch commits atomically at one instant",
                    )
                ts = stamps.pop() if stamps else int(now_fn())
                backend.store_graphs(graphs, ts)
                self._send(200, "", "text/plain")
            except (json.JSONDecodeError, UnicodeDecodeError) as e:
                self._error(400, f"bad request body: {e}")
            except ValueError as e:
                self._error(400, str(e))
            except Exception as e:
                self._error(500, str(e), type(e).__name__)

        def do_DELETE(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/api/graphs" or read_only:
                return self._error(404, "no such endpoint")
            if not self._check_key():
                return
            q = parse_qs(url.query)
            if "id" not in q:
                return self._error(400, "missing id parameter")
            try:
                ts = int(q.get("timestamp", [0])[0] or now_fn())
                backend.delete_graph(q["id"][0], ts)
                self._send(200, "", "text/plain")
            except ValueError as e:
                self._error(400, str(e))
            except Exception as e:
                self._error(500, str(e), type(e).__name__)

    return Handler


class _ReplicaSyncer(threading.Thread):
    """Background fetch loop for a read replica — the reference's
    continuous replication: its writer pushes every 60 s and the
    query-cache fetches updates per read
    (``src/bin/rdf-diff-writer.rs:109-123``, ``src/git.rs:88-132``).
    Here the replica polls the primary's delta log every ``every_s``
    seconds (file-level rsync, immutable segments) and invalidates the
    serving backend whenever anything changed, so reads see new commits
    within one poll with no operator action."""

    def __init__(self, src: str, dst: str, backend, every_s: float):
        super().__init__(daemon=True)
        self.src, self.dst = src, dst
        self.backend = backend
        self.every_s = every_s
        self._halt = threading.Event()
        self.rounds = 0
        self.last_error: str | None = None

    def sync_once(self) -> bool:
        from .metrics import REGISTRY
        from .state.append import LogLockedError
        from .state.sync import sync_store

        try:
            res = sync_store(self.src, self.dst)
        except LogLockedError:
            return False  # a concurrent sync/writer owns dst; next poll
        self.rounds += 1
        changed = bool(res.get("copied") or res.get("removed"))
        if changed:
            self.backend.invalidate()
            REGISTRY.counter_inc("replica_sync_changes")
        REGISTRY.counter_inc("replica_sync_rounds")
        return changed

    def run(self) -> None:
        while not self._halt.wait(self.every_s):
            try:
                self.sync_once()
            except Exception as e:  # keep polling; surface via /metrics
                self.last_error = f"{type(e).__name__}: {e}"

    def stop(self) -> None:
        self._halt.set()


class DiffStoreServer:
    """Threaded HTTP server over one delta-log store.

    ``api_key=None`` disables write auth (the reference exits at boot
    without ``API_KEY``, ``src/api.rs:9-13``; a library default of
    "unauthenticated local dev server" is friendlier and explicit).
    ``port=0`` binds an ephemeral port (see ``.port`` after start).

    ``replica_of=<primary delta dir>`` turns the server into a read
    replica: the local store is fetched from the primary at boot (an
    empty/missing local dir bootstraps like the reference's
    clone-if-absent) and re-fetched every ``sync_every`` seconds in the
    background; writes are disabled (read_only is forced).
    """

    def __init__(self, delta_dir: str, *, host: str = "127.0.0.1",
                 port: int = 0, api_key: str | None = None,
                 read_only: bool = False, prefixes: dict | None = None,
                 distributed: bool = False, services: dict | None = None,
                 replica_of: str | None = None, sync_every: float = 60.0,
                 now_fn=time.time):
        cls = DistributedStoreBackend if distributed else StoreBackend
        self.backend = cls(delta_dir, prefixes=prefixes, services=services)
        self._syncer = None
        if replica_of is not None:
            read_only = True
            self._syncer = _ReplicaSyncer(replica_of, delta_dir,
                                          self.backend, sync_every)
            self._syncer.sync_once()  # boot: clone-if-absent
        handler = _make_handler(self.backend, api_key, read_only, now_fn)
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "DiffStoreServer":
        if self._syncer is not None:
            self._syncer.start()
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        if self._syncer is not None and not self._syncer.is_alive():
            self._syncer.start()
        self._httpd.serve_forever()

    def shutdown(self) -> None:
        if self._syncer is not None:
            self._syncer.stop()
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
        if self._syncer is not None and self._syncer.is_alive():
            self._syncer.join(timeout=10)
        self.backend.close()
