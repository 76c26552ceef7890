"""SonarClient against a live EmbeddingServer: roundtrip, chunking,
retry-on-shed (the 503/Retry-After contract), non-retryable 4xx, retries
exhausted. Uses stub pipelines throughout — no XLA programs compiled."""

import threading

import numpy as np
import pytest

from sonar_tpu.client import ServerError, SonarClient
from sonar_tpu.serving import EmbeddingServer


class EchoPipeline:
    """Deterministic text->vector stub: embedding = [len(t), ord(t[0])]."""

    def predict(self, texts, source_lang=None, batching=None):
        return np.asarray(
            [[float(len(t)), float(ord(t[0]))] for t in texts], np.float32
        )


@pytest.fixture()
def echo_server():
    srv = EmbeddingServer(EchoPipeline(), max_wait_ms=1).start()
    yield srv
    srv.stop()


def client_for(srv, **kw) -> SonarClient:
    host, port = srv.address
    return SonarClient(host, port, **kw)


def test_embed_roundtrip_and_order(echo_server):
    with client_for(echo_server) as c:
        texts = ["hello", "a", "worlds"]
        got = c.embed(texts, lang="eng_Latn")
        np.testing.assert_array_equal(got, EchoPipeline().predict(texts))
        assert c.healthz()["status"] == "ok"


def test_chunking_splits_requests_and_preserves_order(echo_server):
    with client_for(echo_server, chunk_size=2) as c:
        before = c.metrics()["embed"]["requests"]
        texts = ["alpha", "b", "charlie", "dd", "e"]
        got = c.embed(texts)
        after = c.metrics()["embed"]["requests"]
        assert after - before == 3  # ceil(5/2) sequential requests
        np.testing.assert_array_equal(got, EchoPipeline().predict(texts))
        assert c.embed([]).shape == (0, 0)


def test_4xx_is_not_retried(echo_server):
    with client_for(echo_server, max_retries=3, backoff_s=0.01) as c:
        before = c.metrics()["embed"]["requests"]
        with pytest.raises(ServerError) as e:
            c._request("POST", "/embed", {"texts": "not-a-list"})
        assert e.value.status == 400
        assert c.metrics()["embed"]["requests"] - before == 1  # single attempt


def test_retries_exhausted_reports_last_error():
    # nothing listens on this port; connection errors retry then give up
    c = SonarClient("127.0.0.1", 1, max_retries=1, backoff_s=0.01)
    with pytest.raises(ServerError, match="retries exhausted"):
        c.healthz()


def test_retry_after_parsing_is_defensive():
    from email.utils import formatdate
    import time as _time

    from sonar_tpu.client import _retry_after_seconds

    assert _retry_after_seconds({"Retry-After": "2"}) == 2.0
    assert _retry_after_seconds({"retry-after": "3"}) == 3.0  # any case
    assert _retry_after_seconds({}) == 0.0
    assert _retry_after_seconds({"Retry-After": "garbage"}) == 0.0
    # RFC 7231 HTTP-date form (proxies rewrite to this)
    future = formatdate(_time.time() + 5, usegmt=True)
    got = _retry_after_seconds({"Retry-After": future})
    assert 0.0 < got <= 6.0
    past = formatdate(_time.time() - 60, usegmt=True)
    assert _retry_after_seconds({"Retry-After": past}) == 0.0


def test_connection_is_reused_across_requests(echo_server):
    # the server speaks HTTP/1.1 keep-alive; the client's single
    # HTTPConnection must survive consecutive requests (same socket)
    with client_for(echo_server) as c:
        c.embed(["one"])
        sock = c._conn.sock
        assert sock is not None
        c.embed(["two"])
        c.metrics()
        assert c._conn.sock is sock


def test_503_shed_is_retried_until_capacity_returns():
    entered = threading.Event()
    release = threading.Event()

    class Blocking:
        def predict(self, texts, source_lang=None, batching=None):
            entered.set()
            assert release.wait(timeout=30)
            return np.zeros((len(texts), 2), np.float32)

    srv = EmbeddingServer(
        Blocking(), max_wait_ms=1, max_pending_sentences=1
    ).start()
    try:
        results = {}

        def bg(name):
            with client_for(srv, max_retries=0) as c0:
                results[name] = c0.embed(["x"])

        ta = threading.Thread(target=bg, args=("a",))
        ta.start()
        assert entered.wait(10)  # worker blocked; backlog empty
        tb = threading.Thread(target=bg, args=("b",))
        tb.start()
        for _ in range(1000):  # B queued -> backlog at the bound
            if srv.batcher.pending >= 1:
                break
            threading.Event().wait(0.01)

        # a releaser thread frees the server while the client is backing off
        def release_after_first_shed():
            for _ in range(1000):
                if srv.metrics["embed"].shed >= 1:
                    break
                threading.Event().wait(0.01)
            release.set()

        tr = threading.Thread(target=release_after_first_shed)
        tr.start()
        with client_for(srv, max_retries=8, backoff_s=0.05) as c:
            got = c.embed(["y"])  # first attempt sheds (503), retry succeeds
        assert got.shape == (1, 2)
        assert srv.metrics["embed"].shed >= 1
        ta.join(30)
        tb.join(30)
        tr.join(30)
        assert results["a"].shape == (1, 2) and results["b"].shape == (1, 2)
    finally:
        release.set()
        srv.stop()
