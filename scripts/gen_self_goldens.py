"""Generate committed self-golden fixtures (tests/data/self_goldens.npz).

Fixed-seed toy models + fixed inputs -> committed fp32 CPU outputs for
every model family. These pin the framework's OWN numerics across rounds
and environment upgrades (a JAX/XLA bump or a refactor that subtly
changes math shows up as a diff even without the real checkpoints the
egress-gated golden gauntlet needs). Regenerate ONLY when an intentional
numeric change is made, and say why in the commit:

    python scripts/gen_self_goldens.py

Checked by tests/unit/test_self_goldens.py.
"""

from __future__ import annotations

from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = Path(__file__).parent.parent / "tests" / "data" / "self_goldens.npz"


def build_all() -> dict:
    """Deterministic toy-model outputs for every family (fp32, CPU)."""
    out: dict = {}
    rng = np.random.default_rng(42)

    # -- text encoder (toy arch, mean pooling) + beam decode ---------------
    from sonar_tpu.generation.beam_search import BeamSearchConfig
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder
    from sonar_tpu.models.sonar_text import (
        SonarTextEncoder,
        sonar_text_decoder_archs,
        sonar_text_encoder_archs,
    )
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    enc = SonarTextEncoder(sonar_text_encoder_archs.get("toy"))
    enc_p = enc.init_params(jax.random.PRNGKey(0))
    seqs = rng.integers(4, 900, size=(4, 12)).astype(np.int32)
    lens = np.asarray([12, 9, 5, 1], np.int32)
    out["text_seqs"], out["text_lens"] = seqs, lens
    out["text_emb"] = np.asarray(
        enc.apply(enc_p, jnp.asarray(seqs), jnp.asarray(lens)).sentence_embeddings,
        np.float32,
    )

    dec = ConditionalTransformerDecoder(sonar_text_decoder_archs.get("toy"))
    dec_p = dec.init_params(jax.random.PRNGKey(1))
    runtime = JitTextDecoder(dec, dec_p)
    memory = rng.normal(size=(3, 1, dec.config.model_dim)).astype(np.float32)
    out["beam_memory"] = memory
    eos = dec.config.vocab_info.eos_idx
    tokens, scores, blens = runtime.generate_beam(
        memory, [eos, 5], BeamSearchConfig(beam_size=3, max_gen_len=8)
    )
    out["beam_tokens"], out["beam_scores"], out["beam_lens"] = tokens, scores, blens

    # -- speech encoder (toy conformer + pooler), incl. on-device fbank ----
    from sonar_tpu.models.sonar_speech import (
        SonarSpeechEncoder,
        sonar_speech_encoder_archs,
    )

    from sonar_tpu.ops.fbank import FbankConfig, batched_fbank, num_frames

    sp = SonarSpeechEncoder(sonar_speech_encoder_archs.get("toy"))
    sp_p = sp.init_params(jax.random.PRNGKey(2))
    t = np.arange(3200, dtype=np.float32) / 16000.0
    wave = (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.normal(size=t.shape)).astype(np.float32)
    fb_cfg = FbankConfig(
        num_mel_bins=sp.config.frontend.num_fbank_channels  # toy arch: 8
    )
    max_frames = num_frames(wave.size, fb_cfg)
    feats, frame_lens = batched_fbank(
        jnp.asarray(wave[None, :]),
        jnp.asarray([wave.size], jnp.int32),
        max_frames,
        fb_cfg,
    )
    out["speech_fbank_rowsum"] = np.asarray(
        jnp.sum(feats[0], axis=-1), np.float32
    )  # [frames]: compact but position-sensitive
    sp_out = sp.apply(sp_p, feats, frame_lens)
    out["speech_emb"] = np.asarray(sp_out.sentence_embeddings, np.float32)

    # -- LASER2 bi-LSTM ----------------------------------------------------
    from sonar_tpu.models.laser2_text import Laser2Config, LaserLstmEncoder

    l2 = LaserLstmEncoder(
        Laser2Config(vocabulary_size=200, pad_idx=1, model_dim=16,
                     hidden_size=24, num_layers=2, bidirectional=True)
    )
    l2_p = l2.init_params(jax.random.PRNGKey(3))
    l2_seqs = rng.integers(4, 200, size=(3, 7)).astype(np.int32)
    l2_lens = np.asarray([7, 4, 2], np.int32)
    out["laser2_seqs"], out["laser2_lens"] = l2_seqs, l2_lens
    out["laser2_emb"] = np.asarray(
        l2.apply(l2_p, jnp.asarray(l2_seqs), jnp.asarray(l2_lens)), np.float32
    )

    # -- BLASER (COMET + QE) & MuTox --------------------------------------
    from sonar_tpu.models.blaser import BlaserConfig, BlaserModel
    from sonar_tpu.models.mutox import MutoxClassifier, MutoxConfig

    emb_dim = 32
    src = rng.normal(size=(2, emb_dim)).astype(np.float32)
    mt = rng.normal(size=(2, emb_dim)).astype(np.float32)
    ref = rng.normal(size=(2, emb_dim)).astype(np.float32)
    out["blaser_src"], out["blaser_mt"], out["blaser_ref"] = src, mt, ref
    bl = BlaserModel(BlaserConfig(embedding_dim=emb_dim, hidden_dims=[48, 24]))
    bl_p = bl.init_params(jax.random.PRNGKey(4))
    out["blaser_comet"] = np.asarray(bl.apply(bl_p, src, mt, ref), np.float32)
    qe = BlaserModel(
        BlaserConfig(input_form="QE", embedding_dim=emb_dim, hidden_dims=[48, 24])
    )
    qe_p = qe.init_params(jax.random.PRNGKey(5))
    out["blaser_qe"] = np.asarray(qe.apply(qe_p, src, mt), np.float32)

    mx = MutoxClassifier(MutoxConfig(input_size=emb_dim))
    mx_p = mx.init_params(jax.random.PRNGKey(6))
    out["mutox_logits"] = np.asarray(mx.apply(mx_p, src), np.float32)
    out["mutox_probs"] = np.asarray(
        mx.apply(mx_p, src, output_prob=True), np.float32
    )

    return out


def main() -> None:
    arrays = build_all()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes, {len(arrays)} arrays)")
    for k, v in arrays.items():
        print(f"  {k}: {getattr(v, 'shape', v)}")


if __name__ == "__main__":
    main()
