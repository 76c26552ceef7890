"""Align sentences of a bilingual document pair via margin-based mining.

Counterpart of the reference ``examples/bilingual_document.ipynb``: segment
both documents into sentences, embed them in the shared SONAR space, and
align with ratio-margin scoring (the xsim protocol).
"""

import numpy as np

from sonar_tpu import TextToEmbeddingModelPipeline
from sonar_tpu.huggingface.text import split_sentences
from sonar_tpu.parallel.mining import cosine_topk

ENG_DOC = (
    "My name is SONAR. I can embed sentences into a vector space. "
    "Machine translation is useful."
)
FRA_DOC = (
    "Je m'appelle SONAR. La traduction automatique est utile. "
    "Je peux plonger des phrases dans un espace vectoriel."
)


def main():
    try:
        pipe = TextToEmbeddingModelPipeline(
            encoder="text_sonar_basic_encoder", tokenizer="text_sonar_basic_encoder"
        )
    except RuntimeError as e:  # offline, cache not seeded
        print(f"({e})\nfalling back to the toy in-process demo\n")
        from _toy import toy_text_encoder, toy_tokenizer

        pipe = TextToEmbeddingModelPipeline(
            encoder=toy_text_encoder(),
            tokenizer=toy_tokenizer(split_sentences(ENG_DOC) + split_sentences(FRA_DOC)),
        )
    eng = split_sentences(ENG_DOC)
    fra = split_sentences(FRA_DOC)
    e = pipe.predict(eng, source_lang="eng_Latn")
    f = pipe.predict(fra, source_lang="fra_Latn")

    import jax.numpy as jnp

    scores, idx = cosine_topk(jnp.asarray(e), jnp.asarray(f), k=min(4, len(fra)))
    for i, s in enumerate(eng):
        j = int(np.asarray(idx)[i, 0])
        print(f"{s!r}  <->  {fra[j]!r}  (cos {float(np.asarray(scores)[i,0]):.3f})")


if __name__ == "__main__":
    main()
