"""Embed sentences into the SONAR space (counterpart of the reference's
README quickstart / sonar_text_demo notebook).

Uses the published checkpoints when the cache is seeded (see README);
offline it demonstrates the same pipeline API on a toy model + toy
tokenizer built in-process.
"""

import numpy as np

from sonar_tpu import TextToEmbeddingModelPipeline

SENTENCES = ["My name is SONAR.", "I can embed the sentences into vector space."]


def toy_pipeline():
    """In-memory (model, params) + synthetic SentencePiece — no downloads."""
    import tempfile
    from pathlib import Path

    import jax

    from sonar_tpu.models.sonar_text import (
        SonarTextEncoder,
        sonar_text_encoder_archs,
    )
    from sonar_tpu.tokenizers.nllb import NllbTokenizer
    from sonar_tpu.tokenizers.spm_proto import (
        ModelProto,
        PIECE_CONTROL,
        PIECE_UNKNOWN,
        SentencePieceProto as P,
        TrainerSpecProto,
        serialize_model_proto,
    )

    pieces = [
        P("<blank>", 0.0, PIECE_CONTROL),
        P("<unk>", 0.0, PIECE_UNKNOWN),
        P("<s>", 0.0, PIECE_CONTROL),
        P("</s>", 0.0, PIECE_CONTROL),
    ]
    words = sorted({w for s in SENTENCES for w in s.replace(".", " .").split()})
    pieces += [P("▁" + w, -float(i + 1)) for i, w in enumerate(words)]
    pieces += [P(c, -20.0) for c in "abcdefghijklmnopqrstuvwxyz.▁"]
    proto = ModelProto(
        pieces=pieces,
        trainer=TrainerSpecProto(unk_id=1, bos_id=2, eos_id=3, pad_id=1),
    )
    tmp = Path(tempfile.mkdtemp()) / "toy.model"
    tmp.write_bytes(serialize_model_proto(proto))
    tok = NllbTokenizer(tmp, langs=["eng_Latn"], default_lang="eng_Latn")
    enc = SonarTextEncoder(sonar_text_encoder_archs.get("toy"))
    params = enc.init_params(jax.random.PRNGKey(0))
    return TextToEmbeddingModelPipeline(encoder=(enc, params), tokenizer=tok)


def main():
    try:
        pipe = TextToEmbeddingModelPipeline(
            encoder="text_sonar_basic_encoder",
            tokenizer="text_sonar_basic_encoder",
        )
    except RuntimeError as e:  # offline, cache not seeded
        print(f"({e})\nfalling back to the toy in-process demo\n")
        pipe = toy_pipeline()
    emb = pipe.predict(SENTENCES, source_lang="eng_Latn")
    print("embeddings:", emb.shape)
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    print("cosine(s0, s1) =", float(n[0] @ n[1]))


if __name__ == "__main__":
    main()
