"""Encode-path device experiments: precision x scan-unroll, device-only vs
dispatch-loop timing.

Device-only: a jitted lax.scan over k stacked same-shape batches (1 dispatch
for k batches) isolates on-device throughput from tunnel dispatch overhead.
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

from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs
from sonar_tpu.nn.transformer import fuse_qkv
from sonar_tpu.ops.quantization import quantize_params_int8

B, S, K_BATCH = 256, 32, 8  # 8192 padded tokens per batch


def bench_variant(name, precision, unroll):
    model = SonarTextEncoder(
        sonar_text_encoder_archs.get("basic"), dtype=jnp.bfloat16,
        scan_unroll=unroll,
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

    @jax.jit
    def encode_many(p, seqs, lens):
        # [k, B, S] -> [k, B, D]: one dispatch for k batches.
        def body(_, batch):
            s, l = batch
            return None, model.apply(p, s, l).sentence_embeddings

        _, out = jax.lax.scan(body, None, (seqs, lens))
        return out

    rng = np.random.default_rng(0)

    def make_inputs():
        seqs = jnp.asarray(
            rng.integers(4, 256000, size=(K_BATCH, B, S)), jnp.int32
        )
        lens = jnp.asarray(
            rng.integers(S // 2, S + 1, size=(K_BATCH, B)), jnp.int32
        )
        return seqs, lens

    inputs = [make_inputs() for _ in range(5)]
    np.asarray(encode_many(params, *inputs[0]))
    ts = []
    for s, l in inputs:
        t0 = time.perf_counter()
        np.asarray(encode_many(params, s, l))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    per_batch = ts[len(ts) // 2] / K_BATCH
    toks = B * S / per_batch
    print(f"{name}: {per_batch * 1e3:.2f} ms/batch on-device, "
          f"{toks / 1e3:.0f}k padded tok/s, ~{toks / 21.2:.0f} sents/s-equiv")


def main():
    for precision in ("int8", "bf16"):
        for unroll in (1, 4):
            bench_variant(f"{precision} unroll={unroll}", precision, unroll)


if __name__ == "__main__":
    main()
