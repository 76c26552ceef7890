"""Round-2 on-chip sweep: packed vs bucketed A/B (interleaved), token-budget
sweep, and final beam-decode numbers after the raw-logits tail change.

Interleaved repeats per CLAUDE.md (tunnel variance ~±30%); distinct input
batches; full host materialization.
"""

import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sonar_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from sonar_tpu.data.batcher import StaticShapeBatcher
from sonar_tpu.data.packing import pack_sequences
from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs
from sonar_tpu.nn.transformer import fuse_qkv
from sonar_tpu.ops.quantization import quantize_params_int8

FINE = (10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 32, 36, 40, 48, 64, 96, 128)


def main():
    model = SonarTextEncoder(sonar_text_encoder_archs.get("basic"), dtype=jnp.bfloat16)

    def prepare(key):
        p = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), model.init_params(key)
        )
        return quantize_params_int8(fuse_qkv(p))

    params = jax.jit(prepare)(jax.random.PRNGKey(0))
    encode = jax.jit(lambda p, s, l: model.apply(p, s, l).sentence_embeddings)
    encode_packed = jax.jit(
        lambda p, t, s, pos: model.apply_packed(p, t, s, pos, max_segments=16)
    )

    rng = np.random.default_rng(0)
    lens = np.clip(
        np.rint(rng.lognormal(mean=2.9, sigma=0.55, size=16384)), 4, 126
    ).astype(np.int32)
    corpus = [rng.integers(4, 256000, size=int(l)).astype(np.int32) for l in lens]
    n = len(corpus)

    runs = {}

    # bucketed variants
    for tpb in (8192, 16384):
        b = StaticShapeBatcher(pad_value=1, len_buckets=FINE, tokens_per_batch=tpb)
        bs = [
            (jnp.asarray(x.seqs), jnp.asarray(x.seq_lens), x.true_batch)
            for x in b.batches(corpus)
        ]
        padded = sum(s.size for s, _, _ in bs)

        def run_bucketed(bs=bs):
            t0 = time.perf_counter()
            outs = [(encode(params, s, l), nb) for s, l, nb in bs]
            tot = 0
            for o, nb in outs:
                np.asarray(o)
                tot += nb
            return tot / (time.perf_counter() - t0)

        runs[f"bucketed_tpb{tpb}"] = run_bucketed
        print(f"# bucketed tpb={tpb}: {len(bs)} batches, "
              f"waste {(1 - lens.sum() / padded) * 100:.1f}%")

    # packed variant (row 128 x 64 rows = 8192 padded tokens/batch)
    packed = list(pack_sequences(corpus, row_len=128, rows_per_batch=64,
                                 max_segments=16))
    pb = [
        (jnp.asarray(p.tokens), jnp.asarray(p.segment_ids),
         jnp.asarray(p.positions), len(p.mapping))
        for p in packed
    ]
    padded = sum(t.size for t, _, _, _ in pb)
    print(f"# packed: {len(pb)} batches, waste {(1 - lens.sum() / padded) * 100:.1f}%")

    def run_packed():
        t0 = time.perf_counter()
        outs = [(encode_packed(params, t, s, pos), k) for t, s, pos, k in pb]
        tot = 0
        for o, k in outs:
            np.asarray(o)
            tot += k
        return tot / (time.perf_counter() - t0)

    runs["packed_128x64"] = run_packed

    # warm all
    for name, fn in runs.items():
        fn()

    results = {k: [] for k in runs}
    for rep in range(3):
        for name, fn in runs.items():
            r = fn()
            results[name].append(r)
            print(f"rep{rep} {name}: {r:.0f} sents/s")
    for name, rs in results.items():
        print(f"## {name}: median {sorted(rs)[1]:.0f} sents/s")

    # beam decode after the raw-logits tail change
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
    from bench_suite import bench_beam_decode

    for b in (8, 64):
        r = bench_beam_decode(batch=b, iters=7)
        print(f"## beam B={b}: {r}")


if __name__ == "__main__":
    main()
