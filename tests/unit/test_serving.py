"""Embedding server: HTTP round-trip, micro-batching, error paths."""

import json
from pathlib import Path
import sys
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from helpers import build_toy_nllb

import jax

from sonar_tpu.inference_pipelines.text import TextToEmbeddingModelPipeline
from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs
from sonar_tpu.serving import EmbeddingServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tok = build_toy_nllb(tmp_path_factory.mktemp("srv"))
    enc = SonarTextEncoder(sonar_text_encoder_archs.get("toy"))
    pipe = TextToEmbeddingModelPipeline(
        encoder=(enc, enc.init_params(jax.random.PRNGKey(0))), tokenizer=tok
    )
    srv = EmbeddingServer(pipe, max_wait_ms=10).start()
    yield srv, pipe
    srv.stop()


def _post(addr, payload, path="/embed"):
    req = urllib.request.Request(
        f"http://{addr[0]}:{addr[1]}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_embed_roundtrip_matches_direct_predict(server):
    srv, pipe = server
    texts = ["hello world", "my name is paul"]
    out = _post(srv.address, {"texts": texts, "lang": "eng_Latn"})
    want = pipe.predict(texts, source_lang="eng_Latn", batching="static")
    got = np.asarray(out["embeddings"], np.float32)
    assert out["dim"] == want.shape[1]
    np.testing.assert_allclose(got, want, atol=1e-4)


def _get_metrics(addr) -> dict:
    return json.loads(
        urllib.request.urlopen(
            f"http://{addr[0]}:{addr[1]}/metrics", timeout=10
        ).read()
    )


def test_concurrent_requests_are_batched_and_correct(server):
    srv, pipe = server
    before = _get_metrics(srv.address)["embed"]
    texts_per_client = [[f"hello {w}"] for w in ("world", "cat", "paul", "name")]
    results = [None] * len(texts_per_client)

    def client(i):
        results[i] = _post(
            srv.address, {"texts": texts_per_client[i], "lang": "eng_Latn"}
        )

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for i, res in enumerate(results):
        want = pipe.predict(
            texts_per_client[i], source_lang="eng_Latn", batching="static"
        )
        np.testing.assert_allclose(
            np.asarray(res["embeddings"], np.float32), want, atol=1e-4
        )

    # /metrics must account the concurrent load: 4 requests / 4 sentences
    # reached the endpoint, every sentence went through a predict batch
    # (coalesced into <= 4 micro-batches), latencies were observed, and the
    # encoder's padding gauge reflects real padded dispatches.
    after = _get_metrics(srv.address)["embed"]
    assert after["requests"] - before["requests"] == 4
    assert after["items"] - before["items"] == 4
    assert after["errors"] == before["errors"]
    assert after["batch_items"] - before["batch_items"] == 4
    assert 1 <= after["batches"] - before["batches"] <= 4
    assert after["latency_p50_ms"] > 0
    assert after["latency_p95_ms"] >= after["latency_p50_ms"]
    assert after["batch_occupancy_mean"] >= 1
    enc = after["encoder"]
    assert enc["padded_tokens"] >= enc["true_tokens"] > 0
    assert 0.0 <= enc["padding_waste"] < 1.0


def test_metrics_counts_errors_and_timeouts_separately(server):
    srv, _ = server
    before = _get_metrics(srv.address)["embed"]
    with pytest.raises(urllib.error.HTTPError):
        _post(srv.address, {"texts": ["x"], "lang": "xx_Fake"})
    after = _get_metrics(srv.address)["embed"]
    assert after["errors"] - before["errors"] == 1
    assert after["timeouts"] == before["timeouts"]  # 400s are not 504s


def test_error_paths(server):
    srv, _ = server
    out = _post(srv.address, {"texts": []})
    assert out["embeddings"] == []

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.address, {"texts": "not-a-list"})
    assert e.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.address, {"texts": ["x"], "lang": "xx_Fake"})
    assert e.value.code == 400  # tokenizer rejects unknown language

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.address, {"texts": ["x"]}, path="/nope")
    assert e.value.code == 404

    health = json.loads(
        urllib.request.urlopen(
            f"http://{srv.address[0]}:{srv.address[1]}/healthz", timeout=10
        ).read()
    )
    assert health["status"] == "ok"


def test_microbatcher_load_shedding_bound_and_recovery():
    from sonar_tpu.serving import MicroBatcher, ServerOverloadedError

    entered = threading.Event()
    release = threading.Event()

    def blocking_predict(items, _key):
        entered.set()
        assert release.wait(timeout=30)
        return [x * 2 for x in items]

    mb = MicroBatcher(
        blocking_predict, max_items=8, max_wait_ms=1, max_pending_items=2
    )
    try:
        fut_a = mb.submit([1], key="k")
        assert entered.wait(timeout=10)  # worker now blocked in predict(A)
        fut_b = mb.submit([2, 3], key="k")  # backlog 0 -> 2: admitted
        with pytest.raises(ServerOverloadedError, match="max_pending_items"):
            mb.submit([4], key="k")  # backlog 2 >= 2: shed
        release.set()
        assert fut_a.result(timeout=30) == [2]
        assert fut_b.result(timeout=30) == [4, 6]
        # backlog accounting returns to zero: new submits are admitted again
        assert mb.submit([5], key="k").result(timeout=30) == [10]
        assert mb._pending_items == 0
    finally:
        release.set()
        mb.close()


def test_http_load_shedding_503_retry_after_and_metrics():
    from sonar_tpu.serving import EmbeddingServer

    entered = threading.Event()
    release = threading.Event()

    class StubPipeline:
        def predict(self, texts, source_lang=None, batching=None):
            entered.set()
            assert release.wait(timeout=30)
            return np.zeros((len(texts), 4), np.float32)

    srv = EmbeddingServer(
        StubPipeline(), max_wait_ms=1, max_pending_sentences=2
    ).start()
    try:
        results = {}

        def client(name, n):
            try:
                results[name] = _post(
                    srv.address,
                    {"texts": ["x"] * n, "lang": "eng_Latn"},
                )
            except urllib.error.HTTPError as e:
                results[name] = e

        ta = threading.Thread(target=client, args=("a", 1))
        ta.start()
        assert entered.wait(timeout=10)  # worker blocked inside predict(A)
        tb = threading.Thread(target=client, args=("b", 2))
        tb.start()
        deadline = 10.0
        while srv.batcher.pending < 1 and deadline > 0:  # B queued
            deadline -= 0.01
            import time as _time

            _time.sleep(0.01)
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(srv.address, {"texts": ["x"], "lang": "eng_Latn"})
        assert exc.value.code == 503
        assert exc.value.headers.get("Retry-After") == "1"
        shed_now = _get_metrics(srv.address)["embed"]["shed"]
        assert shed_now == 1
        release.set()
        ta.join(timeout=30)
        tb.join(timeout=30)
        assert results["a"]["dim"] == 4 and results["b"]["dim"] == 4
    finally:
        release.set()
        srv.stop()


def test_graceful_drain_refuses_new_work_but_finishes_accepted():
    from sonar_tpu.serving import EmbeddingServer

    entered = threading.Event()
    release = threading.Event()

    class Blocking:
        def predict(self, texts, source_lang=None, batching=None):
            entered.set()
            assert release.wait(timeout=30)
            return np.zeros((len(texts), 3), np.float32)

    srv = EmbeddingServer(Blocking(), max_wait_ms=1).start()
    try:
        results = {}

        def client():
            results["a"] = _post(
                srv.address, {"texts": ["x"], "lang": "eng_Latn"}
            )

        t = threading.Thread(target=client)
        t.start()
        assert entered.wait(10)  # request accepted, worker busy
        # in-flight (popped, inside predict) still counts as pending: a
        # graceful drain must wait on it, and healthz must report it
        assert srv.pending == 1
        health = json.loads(
            urllib.request.urlopen(
                f"http://{srv.address[0]}:{srv.address[1]}/healthz", timeout=10
            ).read()
        )
        assert health["pending"] == 1
        srv.drain()
        health = json.loads(
            urllib.request.urlopen(
                f"http://{srv.address[0]}:{srv.address[1]}/healthz", timeout=10
            ).read()
        )
        assert health["status"] == "draining"
        before = _get_metrics(srv.address)["embed"]
        # large body: the 503 must arrive cleanly (body drained before the
        # reply — otherwise the kernel RSTs and the client sees a reset)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(
                srv.address,
                {"texts": ["y" * 2_000_000], "lang": "eng_Latn"},
            )
        assert e.value.code == 503
        assert e.value.headers.get("Retry-After") == "1"
        after = _get_metrics(srv.address)["embed"]
        # drain refusals are visible in metrics, attributed to the endpoint
        assert after["shed"] - before["shed"] == 1
        assert after["errors"] - before["errors"] == 1
        release.set()
        t.join(30)
        assert results["a"]["dim"] == 3  # accepted work still completed
        for _ in range(500):  # worker's in-flight decrement races the reply
            if srv.pending == 0:
                break
            threading.Event().wait(0.01)
        assert srv.pending == 0
    finally:
        release.set()
        srv.stop()


def test_stop_with_drain_timeout_completes_backlog():
    from sonar_tpu.serving import EmbeddingServer

    class Slowish:
        def predict(self, texts, source_lang=None, batching=None):
            import time as _t

            _t.sleep(0.05)
            return np.ones((len(texts), 2), np.float32)

    srv = EmbeddingServer(Slowish(), max_wait_ms=1).start()
    results = {}

    def client(i):
        results[i] = _post(srv.address, {"texts": [f"t{i}"], "lang": "eng_Latn"})

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for _ in range(1000):  # all three accepted into predict calls
        if srv.metrics["embed"].batch_items >= 3:
            break
        threading.Event().wait(0.01)
    srv.stop(drain_timeout_s=30.0)
    for t in threads:
        t.join(30)
    assert all(results[i]["dim"] == 2 for i in range(3)), results


@pytest.fixture(scope="module")
def full_server(tmp_path_factory):
    """Server with all three endpoints: text embed, translate, speech embed."""
    import dataclasses

    from sonar_tpu import TextToTextModelPipeline
    from sonar_tpu.inference_pipelines.speech import (
        JitSpeechEncoder,
        SpeechToEmbeddingModelPipeline,
    )
    from sonar_tpu.models.sonar_speech import (
        SonarSpeechEncoder,
        sonar_speech_encoder_archs,
    )
    from sonar_tpu.models.sonar_text import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder
    from sonar_tpu.ops.fbank import FbankConfig

    tok = build_toy_nllb(tmp_path_factory.mktemp("fullsrv"))
    enc_cfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_encoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    dec_cfg = dataclasses.replace(
        sonar_text_decoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_decoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    enc = SonarTextEncoder(enc_cfg)
    enc_bundle = (enc, enc.init_params(jax.random.PRNGKey(0)))
    dec = ConditionalTransformerDecoder(dec_cfg)
    dec_bundle = (dec, dec.init_params(jax.random.PRNGKey(1)))

    embed_pipe = TextToEmbeddingModelPipeline(encoder=enc_bundle, tokenizer=tok)
    t2t = TextToTextModelPipeline(
        encoder=enc_bundle, decoder=dec_bundle, tokenizer=tok
    )
    speech_model = SonarSpeechEncoder(sonar_speech_encoder_archs.get("toy"))
    speech_enc = JitSpeechEncoder(
        speech_model,
        speech_model.init_params(jax.random.PRNGKey(2)),
        fbank_config=FbankConfig(num_mel_bins=8),
    )
    speech_pipe = SpeechToEmbeddingModelPipeline(encoder=speech_enc)

    srv = EmbeddingServer(
        embed_pipe, max_wait_ms=10, translator=t2t, speech_pipeline=speech_pipe
    ).start()
    yield srv, t2t, speech_pipe
    srv.stop()


def test_translate_endpoint(full_server):
    srv, t2t, _ = full_server
    texts = ["hello world", "my name is paul"]
    out = _post(
        srv.address,
        {"texts": texts, "source_lang": "eng_Latn", "target_lang": "fra_Latn"},
        path="/translate",
    )
    want = t2t.predict(texts, source_lang="eng_Latn", target_lang="fra_Latn")
    assert out["translations"] == list(want)

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.address, {"texts": texts}, path="/translate")  # missing langs
    assert e.value.code == 400


def test_embed_speech_endpoint(full_server):
    srv, _, speech_pipe = full_server
    rng = np.random.default_rng(0)
    waves = [
        (rng.normal(size=6000) * 0.1).astype(np.float32),
        (rng.normal(size=9000) * 0.1).astype(np.float32),
    ]
    out = _post(
        srv.address, {"audios": [w.tolist() for w in waves]}, path="/embed_speech"
    )
    want = speech_pipe.predict(waves)
    got = np.asarray(out["embeddings"], np.float32)
    assert out["dim"] == want.shape[1]
    np.testing.assert_allclose(got, want, atol=1e-4)

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.address, {"audios": "nope"}, path="/embed_speech")
    assert e.value.code == 400


def test_unconfigured_endpoints_404(server):
    srv, _ = server  # plain embed-only server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(
            srv.address,
            {"texts": ["x"], "source_lang": "eng_Latn", "target_lang": "fra_Latn"},
            path="/translate",
        )
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.address, {"audios": [[0.1, 0.2]]}, path="/embed_speech")
    assert e.value.code == 404


def test_non_object_json_body_is_rejected(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.address, [1, 2, 3])  # valid JSON, not an object
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.address, "just a string")
    assert e.value.code == 400
    # worker survived the bad requests
    out = _post(srv.address, {"texts": ["hello"], "lang": "eng_Latn"})
    assert len(out["embeddings"]) == 1


def test_server_warmup_flag(tmp_path_factory, monkeypatch):
    """warmup=True precompiles the embed path at construction; serving
    results are unchanged. Small buckets keep the toy warmup fast: the
    subject is the flag wiring, not the full serving bucket set (covered
    by test_encoder_warmup_compiles_serving_shapes), so the fine-grained
    static buckets are monkeypatched down to two."""
    import dataclasses

    import sonar_tpu.inference_pipelines.text as text_mod

    monkeypatch.setattr(
        text_mod, "_static_len_buckets_for", lambda max_len: (8, max_len)
    )
    tok2 = build_toy_nllb(tmp_path_factory.mktemp("warm"))
    cfg = sonar_text_encoder_archs.get("toy")
    cfg = dataclasses.replace(cfg, max_seq_len=16)
    enc = SonarTextEncoder(cfg)
    pipe = TextToEmbeddingModelPipeline(
        encoder=(enc, enc.init_params(jax.random.PRNGKey(0))), tokenizer=tok2
    )
    srv = EmbeddingServer(pipe, max_wait_ms=5, warmup=True).start()
    try:
        out = _post(srv.address, {"texts": ["hello world"],
                                  "source_lang": "eng_Latn"})
        assert out["dim"] > 0 and len(out["embeddings"]) == 1
    finally:
        srv.stop()


def test_pipeline_warmups(full_server):
    """Translator and speech pipeline warmups compile the serve-time
    programs (counts > 0) and leave results unchanged; the server's
    warmup flag reaches them via hasattr dispatch."""
    _, t2t, speech_pipe = full_server
    n = t2t.warmup(batch_size=2)
    assert n >= 2  # at least one encoder bucket + the beam program
    texts = ["hello world", "my name is paul"]
    before = t2t.predict(texts, source_lang="eng_Latn",
                         target_lang="fra_Latn", batch_size=2)
    assert len(before) == 2

    n = speech_pipe.warmup(batch_size=2, max_wave_len=16000)
    assert n == 1  # exactly the 1 s bucket
    rng = np.random.default_rng(0)
    waves = [(rng.normal(size=12000) * 0.1).astype(np.float32),
             (rng.normal(size=15000) * 0.1).astype(np.float32)]
    out = speech_pipe.predict(waves, batch_size=2)
    assert out.shape == (2, speech_pipe.model.model_dim)


def test_microbatcher_unhashable_key_isolated_and_close_race():
    """An unhashable batching key fails only its own request (others in the
    same drain still resolve); submit racing close() resolves promptly
    instead of hanging until the request timeout."""
    from sonar_tpu.serving import MicroBatcher

    mb = MicroBatcher(lambda items, key: [x * 2 for x in items],
                      max_items=16, max_wait_ms=30.0)
    bad = mb.submit([1], key=["unhashable"])
    good = mb.submit([2], key="k")
    assert good.result(timeout=10) == [4]
    with pytest.raises(TypeError):
        bad.result(timeout=10)
    mb.close()
    late = mb.submit([3], key="k")
    with pytest.raises(RuntimeError, match="shutting down"):
        late.result(timeout=5)


def test_non_string_lang_rejected_fast(server):
    """A non-string lang is rejected at the handler (400) rather than
    stalling the micro-batch with an unhashable key."""
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.address, {"texts": ["x"], "lang": ["eng_Latn"]})
    assert e.value.code == 400
    out = _post(srv.address, {"texts": ["still works"], "lang": "eng_Latn"})
    assert len(out["embeddings"]) == 1
