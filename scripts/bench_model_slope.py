"""True device-time of the full text encoder per 8192-token batch.

Slope method: jit(scan over k batches) at k=10 and k=50; per-batch device
time = (t50 - t10) / 40. Outputs (sentence embeddings) are returned whole,
so nothing is DCE-able. Distinct batches per scan step (scanned inputs).
"""

import os
from pathlib import Path
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sonar_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs
from sonar_tpu.nn.transformer import fuse_qkv, set_ffn_impl
from sonar_tpu.ops.quantization import quantize_params_int8

B, S = 256, 32  # 8192 padded tokens
K1, K2 = 10, 50
PASSES = 3


def bench_variant(name, precision, ffn_impl="auto"):
    set_ffn_impl(ffn_impl)
    model = SonarTextEncoder(
        sonar_text_encoder_archs.get("basic"), dtype=jnp.bfloat16
    )

    def prepare(key):
        p = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), model.init_params(key)
        )
        p = fuse_qkv(p)
        if precision == "int8":
            p = quantize_params_int8(p)
        return p

    params = jax.jit(prepare)(jax.random.PRNGKey(0))

    def encode_many(p, seqs, lens):
        def body(_, batch):
            s, l = batch
            return None, model.apply(p, s, l).sentence_embeddings

        _, out = jax.lax.scan(body, None, (seqs, lens))
        return out

    encode_many = jax.jit(encode_many)
    rng = np.random.default_rng(0)
    times = {}
    for k in (K1, K2):
        seqs = jnp.asarray(rng.integers(4, 256000, size=(k, B, S)), jnp.int32)
        lens = jnp.asarray(rng.integers(S // 2, S + 1, size=(k, B)), jnp.int32)
        np.asarray(encode_many(params, seqs, lens))
        ts = []
        for _ in range(PASSES):
            # fresh data each pass (tunnel content caching)
            seqs = jnp.asarray(
                rng.integers(4, 256000, size=(k, B, S)), jnp.int32
            )
            t0 = time.perf_counter()
            np.asarray(encode_many(params, seqs, lens))
            ts.append(time.perf_counter() - t0)
        times[k] = sorted(ts)[len(ts) // 2]
    per_batch = (times[K2] - times[K1]) / (K2 - K1)
    toks = B * S / per_batch
    print(f"{name:34s} {per_batch * 1e3:7.2f} ms/batch  {toks / 1e3:6.0f}k tok/s  "
          f"~{toks / 21.2:5.0f} sents/s-equiv  (k10={times[K1]*1e3:.0f}ms k50={times[K2]*1e3:.0f}ms)")
    set_ffn_impl("auto")


def main():
    print(f"devices: {jax.devices()}  B={B} S={S}")
    bench_variant("int8 + block kernels (auto)", "int8", "auto")
    bench_variant("int8, XLA ffn", "int8", "xla")
    bench_variant("bf16", "bf16")


if __name__ == "__main__":
    main()
