"""Embed sentences into the SONAR space (counterpart of the reference's
README quickstart / sonar_text_demo notebook).

Requires the published checkpoints in the cache (see README); falls back to
a toy model demo offline.
"""

import numpy as np

from sonar_tpu import TextToEmbeddingModelPipeline

SENTENCES = ["My name is SONAR.", "I can embed the sentences into vector space."]


def main():
    pipe = TextToEmbeddingModelPipeline(
        encoder="text_sonar_basic_encoder",
        tokenizer="text_sonar_basic_encoder",
    )
    emb = pipe.predict(SENTENCES, source_lang="eng_Latn")
    print("embeddings:", emb.shape)
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    print("cosine(s0, s1) =", float(n[0] @ n[1]))


if __name__ == "__main__":
    main()
