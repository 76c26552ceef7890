"""Kernel-gate scope semantics: thread isolation and jit-cache keying.

The ``no_tpu_kernels()`` flag is read at TRACE time by every Pallas
dispatch gate; these tests pin the two hazards the round-2 advisor
flagged: (a) a bare global is not thread-safe, (b) a jitted wrapper
traced outside the scope must not be silently reused inside it.
"""

import threading

import jax
import numpy as np

from sonar_tpu.ops import attention as A


def test_no_tpu_kernels_nesting():
    assert not A.tpu_kernels_disabled()
    with A.no_tpu_kernels():
        assert A.tpu_kernels_disabled()
        with A.no_tpu_kernels():
            assert A.tpu_kernels_disabled()
        assert A.tpu_kernels_disabled()
    assert not A.tpu_kernels_disabled()


def test_no_tpu_kernels_thread_isolation():
    """A scope entered on one thread must not leak into another."""
    entered = threading.Event()
    release = threading.Event()
    seen_in_other = []

    def holder():
        with A.no_tpu_kernels():
            entered.set()
            release.wait(timeout=10)

    t = threading.Thread(target=holder)
    t.start()
    try:
        assert entered.wait(timeout=10)
        assert not A.tpu_kernels_disabled()  # main thread unaffected

        def prober():
            seen_in_other.append(A.tpu_kernels_disabled())

        p = threading.Thread(target=prober)
        p.start()
        p.join(timeout=10)
        assert seen_in_other == [False]
    finally:
        release.set()
        t.join(timeout=10)


def test_kernel_gate_scope_helper():
    with A.kernel_gate_scope(True):
        assert A.tpu_kernels_disabled()
    with A.kernel_gate_scope(False):
        assert not A.tpu_kernels_disabled()


def test_jit_text_encoder_keys_trace_cache_on_scope():
    """The same encoder instance used outside then inside a
    ``no_tpu_kernels()`` scope must produce identical embeddings AND key
    its jit cache on the flag (two distinct traces, not one reused)."""
    from sonar_tpu.inference_pipelines.text import JitTextEncoder
    from sonar_tpu.models.sonar_text.config import sonar_text_encoder_archs
    from sonar_tpu.models.sonar_text.model import SonarTextEncoder

    cfg = sonar_text_encoder_archs.get("toy")
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    enc = JitTextEncoder(model, params, fuse_qkv=False)

    from sonar_tpu.data.collate import SequenceBatch

    seqs = np.array([[3, 4, 5, 1], [3, 7, 1, 1]], np.int32)
    lens = np.array([4, 3], np.int32)
    batch = SequenceBatch(seqs=seqs, seq_lens=lens, true_batch=2)

    assert not enc._kernels_off()
    out_plain = enc.encode_batch(batch)
    n_traces = enc._fn._cache_size()
    with A.no_tpu_kernels():
        assert enc._kernels_off()
        out_scoped = enc.encode_batch(batch)
    assert enc._fn._cache_size() == n_traces + 1  # re-traced, not reused
    np.testing.assert_allclose(out_plain, out_scoped, atol=1e-5)


def test_jit_speech_encoder_keys_trace_cache_on_scope():
    """Same contract as the text encoder: the speech wrapper re-traces
    (not reuses) when called inside a ``no_tpu_kernels()`` scope."""
    from sonar_tpu.inference_pipelines.speech import JitSpeechEncoder
    from sonar_tpu.models.sonar_speech.config import sonar_speech_encoder_archs
    from sonar_tpu.models.sonar_speech.model import SonarSpeechEncoder
    from sonar_tpu.ops.fbank import FbankConfig

    cfg = sonar_speech_encoder_archs.get("toy")
    model = SonarSpeechEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    enc = JitSpeechEncoder(model, params, fbank_config=FbankConfig(num_mel_bins=8))

    rng = np.random.default_rng(0)
    waves = [(rng.normal(size=4000) * 0.1).astype(np.float32)]
    out_plain = enc.encode_waveforms(waves)
    n_traces = enc._fn._cache_size()
    with A.no_tpu_kernels():
        assert enc._kernels_off()
        out_scoped = enc.encode_waveforms(waves)
    assert enc._fn._cache_size() == n_traces + 1
    np.testing.assert_allclose(out_plain, out_scoped, atol=1e-5)
