"""xsim retrieval evaluation + sharded cosine mining over a device mesh.

Demonstrates the scale-out layer (new TPU-native capability; the reference
has no distributed code — SURVEY §2.4): the embedding bank is sharded over
the mesh's data axis and top-k mining runs one MXU matmul per shard with a
k-candidate all_gather merge over ICI.
"""

import jax
import numpy as np

from sonar_tpu.parallel.mining import sharded_cosine_topk, xsim


def main():
    rng = np.random.default_rng(0)
    n, d = 512, 1024
    src = rng.normal(size=(n, d)).astype(np.float32)
    noise = rng.normal(size=(n, d)).astype(np.float32)
    tgt = src + 0.3 * noise  # noisy "translations"

    print(f"xsim error: {xsim(src, tgt):.2f}%")

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("data",))
    scores, idx = sharded_cosine_topk(
        jax.numpy.asarray(src[:16]), jax.numpy.asarray(tgt), k=4, mesh=mesh
    )
    hits = (np.asarray(idx)[:, 0] == np.arange(16)).mean()
    print(f"sharded top-1 retrieval accuracy over {len(jax.devices())} devices: {hits:.2%}")


if __name__ == "__main__":
    main()
