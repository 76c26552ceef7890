"""MuTox toxicity scoring over text and speech (reference
``examples/mutox_example.ipynb`` counterpart)."""

import sys

import jax.numpy as jnp

from sonar_tpu import TextToEmbeddingModelPipeline
from sonar_tpu.assets.hub import load_mutox_model


def main(sentences):
    pipe = TextToEmbeddingModelPipeline(
        encoder="text_sonar_basic_encoder", tokenizer="text_sonar_basic_encoder"
    )
    emb = pipe.predict(sentences, source_lang="eng_Latn")
    clf, params = load_mutox_model("sonar_mutox")
    probs = clf.apply(params, jnp.asarray(emb), output_prob=True)
    for s, p in zip(sentences, probs):
        print(f"{float(p[0]):.3f}  {s}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["I like cats.", "You are horrible."])
