"""Minimal production-style embedding server with request micro-batching.

The serving-side counterpart the reference leaves to its users: concurrent
HTTP requests are coalesced by a background batcher into one
``TextToEmbeddingModelPipeline.predict`` call (static shape buckets +
dispatch stacking do the TPU-side work), so per-request latency amortizes
the per-dispatch cost instead of paying it per sentence.

Stdlib-only (``http.server`` + ``ThreadingHTTPServer``); intended both as
a deployable starting point and as the executable spec for how to batch
SONAR serving traffic. See ``examples/serving_demo.py`` / the unit test
for end-to-end use.

API:
    POST /embed   {"texts": ["...", ...], "lang": "eng_Latn"}
        -> {"embeddings": [[...], ...], "dim": D}
    GET  /healthz -> {"status": "ok", "pending": N}
"""

from __future__ import annotations

import json
import logging
import queue
import threading
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class MicroBatcher:
    """Coalesce concurrent embed requests into batched predict calls.

    Requests enqueue (texts, lang, future); a single worker drains up to
    ``max_sentences`` sentences, waiting at most ``max_wait_ms`` after the
    first arrival so a lone request is never stalled for long. Each drain
    groups by language (one predict per language) and resolves futures.
    """

    def __init__(
        self,
        pipeline,
        max_sentences: int = 256,
        max_wait_ms: float = 5.0,
    ):
        self.pipeline = pipeline
        self.max_sentences = max_sentences
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, texts: Sequence[str], lang: str) -> Future:
        fut: Future = Future()
        self._q.put((list(texts), lang, fut))
        return fut

    @property
    def pending(self) -> int:
        return self._q.qsize()

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    # -- worker ---------------------------------------------------------------

    def _drain(self) -> List[Tuple[List[str], str, Future]]:
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        total = len(first[0])
        deadline = self.max_wait
        import time

        t0 = time.monotonic()
        while total < self.max_sentences:
            remaining = deadline - (time.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            batch.append(item)
            total += len(item[0])
        return batch

    @staticmethod
    def _resolve(fut: Future, result=None, exc=None) -> None:
        """set_result/set_exception tolerant of a concurrent cancel — the
        check-then-act `if not fut.cancelled()` pattern races with client
        cancels and an InvalidStateError there would kill the worker."""
        try:
            if exc is not None:
                fut.set_exception(exc)
            else:
                fut.set_result(result)
        except Exception:
            pass  # future already cancelled/resolved

    def _process(self, batch) -> None:
        by_lang: dict = {}
        for texts, lang, fut in batch:
            by_lang.setdefault(lang, []).append((texts, fut))
        for lang, items in by_lang.items():
            flat = [t for texts, _ in items for t in texts]
            try:
                emb = self.pipeline.predict(
                    flat, source_lang=lang, batching="static"
                )
            except Exception as e:
                for _, fut in items:
                    self._resolve(fut, exc=e)
                continue
            ofs = 0
            for texts, fut in items:
                self._resolve(fut, result=emb[ofs : ofs + len(texts)])
                ofs += len(texts)

    def _worker(self) -> None:
        while not self._stop.is_set():
            try:
                batch = self._drain()
                if batch:
                    self._process(batch)
            except BaseException:  # the single worker must never die
                logger.exception("micro-batcher iteration failed")
        # shutdown: fail anything still queued instead of leaving clients
        # blocked until their full request timeout
        while True:
            try:
                _, _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            self._resolve(fut, exc=RuntimeError("server shutting down"))


class EmbeddingServer:
    """HTTP wrapper around a MicroBatcher; see module docstring for the API."""

    def __init__(
        self,
        pipeline,
        host: str = "127.0.0.1",
        port: int = 0,
        max_sentences: int = 256,
        max_wait_ms: float = 5.0,
        request_timeout_s: float = 120.0,
    ):
        self.batcher = MicroBatcher(pipeline, max_sentences, max_wait_ms)
        self.request_timeout_s = request_timeout_s
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route through logging
                logger.debug("http: " + fmt, *args)

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(
                        200, {"status": "ok", "pending": server.batcher.pending}
                    )
                else:
                    self._reply(404, {"error": "unknown path"})

            def do_POST(self):
                if self.path != "/embed":
                    self._reply(404, {"error": "unknown path"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    if not isinstance(req, dict):
                        raise ValueError("request body must be a JSON object")
                    texts = req["texts"]
                    lang = req.get("lang", "eng_Latn")
                    if not isinstance(texts, list) or not all(
                        isinstance(t, str) for t in texts
                    ):
                        raise ValueError("'texts' must be a list of strings")
                except (KeyError, ValueError, json.JSONDecodeError) as e:
                    self._reply(400, {"error": str(e)})
                    return
                if not texts:
                    self._reply(200, {"embeddings": [], "dim": 0})
                    return
                fut = server.batcher.submit(texts, lang)
                try:
                    emb = fut.result(timeout=server.request_timeout_s)
                except Exception as e:  # model/tokenizer errors -> 400
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                self._reply(
                    200,
                    {
                        "embeddings": np.asarray(emb, np.float32).tolist(),
                        "dim": int(np.asarray(emb).shape[-1]),
                    },
                )

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self._serve_thread: Optional[threading.Thread] = None

    @property
    def address(self) -> Tuple[str, int]:
        return self.httpd.server_address[:2]

    def start(self) -> "EmbeddingServer":
        self._serve_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._serve_thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._serve_thread is not None:
            self._serve_thread.join(timeout=5)
        self.batcher.close()
