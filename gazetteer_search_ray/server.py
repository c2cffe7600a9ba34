"""HTTP serve layer — the reference's third CLI command.

Reference flow (``server/REServer.java:54-96`` → routes
``server/REServerRoutes.java:40-67`` → param parsing
``api/SearchAPIAdapter.java:63-137`` → ``ESDefaultSearch.search`` →
``api/ResultsWrapper.java:27-75``): a thin HTTP adapter over the search
stack.  Here the adapter is a stdlib ``ThreadingHTTPServer`` over a warm
``Searcher`` (or, when a Ray session is up and ``pool_size > 1``, the
``QueryService`` actor pool — each worker holds index + caches loaded
once, the reference's singleton-ES-client analog).

Routes:

* ``GET /location/_search`` — params mirroring the reference adapter:
  ``q`` (required), ``prefix`` (bool), ``page``/``size`` (from/size
  paging, defaults 0/20 — ``SearchAPIAdapter.java:20,131-137``),
  ``lang``/``repo`` (structured filters, the Q13 analog of
  refs/poiclass), ``coallesce`` (sic — reference spelling, cascade
  on/off), ``prior`` (doc-prior rescoring), ``trim``, ``verbose``
  (hit field sets, Q17).  Response
  ``{"result": "success", "answer_time", "total_hits", "rows": [...]}``
  (``ResultsWrapper.java:27-40``).
* ``GET /index/stats`` — manifest stats (n_docs, avgdl, …).
* ``GET /healthcheck`` — liveness.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_TRUE = {"1", "true", "yes", "on"}


def _flag(qs: dict, name: str, default: bool = False) -> bool:
    v = qs.get(name)
    return default if v is None else v[0].lower() in _TRUE


class SearchHTTPServer:
    """Owns the HTTP listener + the warm search backend."""

    def __init__(self, index_dir: str, port: int = 0, pool_size: int = 1,
                 use_prior: bool = False):
        from .pipelines.search import Searcher

        self.index_dir = index_dir
        self._svc = None
        self._searcher = None
        if pool_size > 1:
            import ray

            if ray.is_initialized():
                from .pipelines.search import QueryService

                self._svc = QueryService(index_dir, pool_size=pool_size,
                                         use_prior=use_prior)
        if self._svc is None:
            self._searcher = Searcher(index_dir)
        self.default_use_prior = use_prior
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                try:
                    if u.path == "/healthcheck":
                        return self._reply(200, {"result": "ok"})
                    if u.path == "/index/stats":
                        return self._reply(200, outer.stats())
                    if u.path == "/location/_search":
                        qs = parse_qs(u.query)
                        if "q" not in qs or not qs["q"][0].strip():
                            return self._reply(
                                400, {"result": "error", "error": "missing q"}
                            )
                        try:
                            payload = outer.search_params(qs)
                        except ValueError as e:  # bad page/size etc.
                            return self._reply(
                                400, {"result": "error", "error": str(e)}
                            )
                        return self._reply(200, payload)
                    return self._reply(404, {"result": "error", "error": "no route"})
                except Exception as e:  # surface, don't kill the thread
                    return self._reply(
                        500, {"result": "error", "error": f"{type(e).__name__}: {e}"}
                    )

        self.httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # -- backend ---------------------------------------------------------

    def stats(self) -> dict:
        from .state.reader import IndexReader

        r = (
            self._searcher.reader
            if self._searcher is not None
            else IndexReader(self.index_dir)
        )
        return {
            "result": "success",
            "n_docs": int(r.n_docs),
            "avgdl": float(r.avgdl),
            "total_tokens": int(r.manifest.get("total_tokens", 0)),
            "import_counter": int(r.manifest.get("import_counter", 0)),
        }

    def search_params(self, qs: dict) -> dict:
        q = qs["q"][0]
        page = max(0, int(qs.get("page", ["0"])[0]))
        size = max(1, int(qs.get("size", ["20"])[0]))
        prefix = _flag(qs, "prefix")
        coalesce = _flag(qs, "coallesce", True)
        verbose = _flag(qs, "verbose")
        trim = _flag(qs, "trim")
        with_matched = _flag(qs, "matched")
        use_prior = _flag(qs, "prior", self.default_use_prior)
        filters = {}
        for col in ("lang", "repo"):
            if col in qs:
                filters[col] = qs[col]
        t0 = time.monotonic()
        # from/size: evaluate (page+1)*size then slice (Q15 paging,
        # ESCoalesce.java:46-51)
        k = (page + 1) * size
        if self._svc is not None and not (with_matched or trim or verbose):
            rows = self._svc.replay(
                [
                    {
                        "qid": 0, "q": q, "k": k, "prefix": prefix,
                        "filters": filters or None,
                    }
                ],
                batch_size=1,
            )
            hits = rows[0]["hits"] if rows else []
        else:
            if self._searcher is None:
                from .pipelines.search import Searcher

                self._searcher = Searcher(self.index_dir)
            hits = self._searcher.search(
                q, k=k, prefix=prefix, filters=filters or None,
                coalesce=coalesce, use_prior=use_prior, trim=trim,
                verbose=verbose, with_matched=with_matched,
            )
        hits = hits[page * size : (page + 1) * size]
        return {
            "result": "success",
            "answer_time": round((time.monotonic() - t0) * 1000, 3),
            "total_hits": len(hits),
            "page": page,
            "size": size,
            "rows": hits,
        }

    # -- lifecycle -------------------------------------------------------

    def start(self) -> "SearchHTTPServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def serve_forever(self):
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self._svc is not None:
            self._svc.shutdown()


def serve(index_dir: str, port: int = 8080, pool_size: int = 1,
          use_prior: bool = False):
    """Blocking serve entry (CLI ``serve`` command)."""
    s = SearchHTTPServer(index_dir, port=port, pool_size=pool_size,
                         use_prior=use_prior)
    print(json.dumps({"serving": f"http://127.0.0.1:{s.port}",
                      "index": index_dir, "pool_size": pool_size}))
    try:
        s.serve_forever()
    except KeyboardInterrupt:
        s.shutdown()
