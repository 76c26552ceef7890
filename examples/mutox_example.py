"""MuTox toxicity scoring over text and speech (reference
``examples/mutox_example.ipynb`` counterpart).

Falls back to in-process toy models offline (scores are then random)."""

import sys

import jax.numpy as jnp

from sonar_tpu import TextToEmbeddingModelPipeline
from sonar_tpu.assets.hub import load_mutox_model


def main(sentences):
    try:
        pipe = TextToEmbeddingModelPipeline(
            encoder="text_sonar_basic_encoder",
            tokenizer="text_sonar_basic_encoder",
        )
        clf, params = load_mutox_model("sonar_mutox")
    except RuntimeError as e:  # offline, cache not seeded
        print(f"({e})\nfalling back to the toy in-process demo\n")
        from _toy import toy_mutox, toy_text_encoder, toy_tokenizer

        enc = toy_text_encoder()
        pipe = TextToEmbeddingModelPipeline(
            encoder=enc, tokenizer=toy_tokenizer(sentences)
        )
        clf, params = toy_mutox(enc[0].config.model_dim)

    emb = pipe.predict(sentences, source_lang="eng_Latn")
    probs = clf.apply(params, jnp.asarray(emb), output_prob=True)
    for s, p in zip(sentences, probs):
        print(f"{float(p[0]):.3f}  {s}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["I like cats.", "You are horrible."])
